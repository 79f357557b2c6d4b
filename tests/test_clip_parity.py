"""Flax CLIP text tower vs the torch/HF reference implementation.

The reference conditions on frozen ``openai/clip-vit-base-patch32`` text
features (utils/language_model.py:7-33). HF weights are not downloadable in
this environment, so — like the MAR/VAE/I3D importer tests — parity is proven
on a randomly-initialized ``transformers`` CLIPTextModelWithProjection at a
small config: identical input_ids must give matching text_embeds through
``torch_import.import_clip_text``. A wrong key map, missing transpose, wrong
activation (quick-gelu), mask, or EOT pooling all fail this.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from unified_video_action_tpu.models import torch_import
from unified_video_action_tpu.models.clip import ClipTextConfig, ClipTextModel


pytestmark = pytest.mark.slow

CFG = dict(
    vocab_size=1000,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    max_position_embeddings=77,
    projection_dim=32,
)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=CFG["vocab_size"],
        hidden_size=CFG["hidden_size"],
        intermediate_size=CFG["intermediate_size"],
        num_hidden_layers=CFG["num_layers"],
        num_attention_heads=CFG["num_heads"],
        max_position_embeddings=CFG["max_position_embeddings"],
        projection_dim=CFG["projection_dim"],
        hidden_act="quick_gelu",
        eos_token_id=999,
        bos_token_id=998,
    )
    torch.manual_seed(0)
    tm = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = torch_import.import_clip_text(sd, CFG["num_layers"])
    fm = ClipTextModel(ClipTextConfig(**CFG, eos_token_id=999))
    return tm, fm, params


def test_text_embeds_parity(pair):
    tm, fm, params = pair
    rng = np.random.RandomState(0)
    # ids below vocab, with a designated "EOT" as the max id per row at a
    # variable position (CLIP pools at argmax(input_ids))
    ids = rng.randint(3, 900, (4, 20)).astype(np.int64)
    for row, pos in enumerate([5, 12, 19, 8]):
        ids[row, pos] = 999  # EOT (pooling position)

    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
    out = np.asarray(fm.apply({"params": params}, jnp.asarray(ids, jnp.int32)))
    assert out.shape == ref.shape == (4, CFG["projection_dim"])
    assert np.abs(out - ref).max() < 1e-4, np.abs(out - ref).max()


def test_param_tree_matches_init(pair):
    """Imported tree has exactly the module's own param structure."""
    _, fm, params = pair
    init = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    init_shapes = jax.tree.map(jnp.shape, init)
    got_shapes = jax.tree.map(np.shape, params)
    assert init_shapes == got_shapes


def test_causal_mask_matters(pair):
    """Future tokens must not influence the pooled feature: changing ids
    AFTER the EOT position (with ids below the EOT id) must not change
    text_embeds... but changing ids BEFORE it must."""
    _, fm, params = pair
    ids = np.full((1, 10), 7, np.int64)
    ids[0, 4] = 999  # EOT at position 4
    base = np.asarray(fm.apply({"params": params}, jnp.asarray(ids, jnp.int32)))

    after = ids.copy()
    after[0, 7] = 3
    out_after = np.asarray(
        fm.apply({"params": params}, jnp.asarray(after, jnp.int32))
    )
    assert np.allclose(out_after, base, atol=1e-6)

    before = ids.copy()
    before[0, 2] = 3
    out_before = np.asarray(
        fm.apply({"params": params}, jnp.asarray(before, jnp.int32))
    )
    assert not np.allclose(out_before, base, atol=1e-4)
