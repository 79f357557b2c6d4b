"""I3D (FVD embedder) parity vs the torch reference, plus weights-gated
real-artifact integration.

The reference computes FVD with a 400-class InceptionI3d
(fvd/pytorch_i3d.py:1-419) whose pretrained weights are fetched at runtime
(fvd/download.py:37-50). Weights are not available offline, so parity is
proven the same way the MAR importer is proven (tests/test_mar_import_parity):
instantiate the torch model with RANDOM weights, import the state dict
through ``import_i3d``, and require the flax forward to match the torch
forward — this pins every key map, kernel transpose, BN statistic, and the
TF-style SAME padding. A separate test runs the REAL pretrained path
end-to-end whenever the artifact exists (UVA_I3D_WEIGHTS or the default
download location).
"""

import numpy as np
import pytest

from tests._reference import import_reference_module, reference_available

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="torch reference unavailable"
)


@pytest.fixture(scope="module")
def torch_i3d():
    torch = pytest.importorskip("torch")
    mod = import_reference_module("unified_video_action.fvd.pytorch_i3d")
    torch.manual_seed(0)
    model = mod.InceptionI3d(num_classes=400, in_channels=3).eval()
    # randomize BN running stats too — the importer must map them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
    return model


def test_i3d_import_forward_parity(torch_i3d):
    """Random-weight torch I3D -> import_i3d -> flax logits match torch."""
    import torch

    from unified_video_action_tpu.eval.i3d import InceptionI3d, import_i3d

    sd = {k: v.detach().numpy() for k, v in torch_i3d.state_dict().items()}
    variables = import_i3d(sd)

    rng = np.random.RandomState(1)
    # (B, 3, T, H, W) in [-1, 1], the reference input convention
    x_torch = rng.uniform(-1, 1, (1, 3, 16, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref_logits = torch_i3d(torch.from_numpy(x_torch)).numpy()
    if ref_logits.ndim == 3:  # reference returns (B, classes, t')
        ref_logits = ref_logits.mean(axis=2)

    model = InceptionI3d(num_classes=400)
    x_flax = np.transpose(x_torch, (0, 2, 3, 4, 1))  # (B, T, H, W, 3)
    out = model.apply(variables, x_flax)
    out = np.asarray(out)

    assert out.shape == ref_logits.shape
    np.testing.assert_allclose(out, ref_logits, atol=2e-3, rtol=1e-3)


def test_i3d_real_weights_integration():
    """Runs only when the pretrained artifact is present (egress or a staged
    file): the full load_i3d_embedder -> embed path on a synthetic video."""
    import os

    from unified_video_action_tpu.eval.i3d import I3D_WEIGHTS_PATH

    if not os.path.exists(I3D_WEIGHTS_PATH):
        pytest.skip(f"pretrained I3D weights absent ({I3D_WEIGHTS_PATH})")

    from unified_video_action_tpu.eval.i3d import load_i3d_embedder

    embed = load_i3d_embedder()
    videos = (
        np.random.RandomState(0).randint(0, 255, (2, 16, 224, 224, 3))
    ).astype(np.uint8)
    e = embed(videos)
    assert e.shape == (2, 400)
    assert np.isfinite(e).all()


def test_clip_real_weights_integration():
    """Runs only when CLIP weights are cached/downloadable: the real
    ClipTextEncoder path (utils/language.py)."""
    from unified_video_action_tpu.utils.language import ClipTextEncoder

    try:
        enc = ClipTextEncoder()
    except Exception as e:  # offline: no hub access, no cache
        pytest.skip(f"CLIP weights unavailable: {type(e).__name__}")
    z = enc.encode(["push the t block to the target"])
    assert z.shape == (1, 512)
    assert np.isfinite(z).all()
