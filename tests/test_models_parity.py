"""Golden parity: flax modules vs reference torch modules on identical
randomly-initialized weights (converted via torch_import)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests._reference import requires_reference, import_reference_module
from unified_video_action_tpu.models.denoiser import MlpDenoiser
from unified_video_action_tpu.models.vae import KLVae
from unified_video_action_tpu.models import torch_import


def _to_numpy_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@requires_reference
def test_mlp_denoiser_parity():
    import torch

    ref_dl = import_reference_module(
        "unified_video_action.model.autoregressive.diffusion_loss"
    )
    torch.manual_seed(0)
    depth, width, zc, cin = 3, 128, 96, 16
    ref = ref_dl.SimpleMLPAdaLN(
        in_channels=cin,
        model_channels=width,
        out_channels=cin * 2,
        z_channels=zc,
        num_res_blocks=depth,
    ).eval()

    params = jax.tree.map(
        jnp.asarray, torch_import.import_mlp_denoiser(_to_numpy_sd(ref), depth)
    )
    model = MlpDenoiser(
        in_channels=cin,
        model_channels=width,
        out_channels=cin * 2,
        z_channels=zc,
        depth=depth,
    )

    rng = np.random.RandomState(1)
    x = rng.randn(8, cin).astype(np.float32)
    t = rng.randint(0, 1000, size=(8,))
    c = rng.randn(8, zc).astype(np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(c)
        ).numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c))
    )
    np.testing.assert_allclose(want, got, rtol=2e-4, atol=2e-5)


@requires_reference
def test_kl_vae_parity():
    import torch
    from types import SimpleNamespace

    ref_vae = import_reference_module("unified_video_action.vae.vaekl")
    torch.manual_seed(0)
    ddconfig = SimpleNamespace(vae_embed_dim=16, ch_mult=[1, 1, 2, 2, 4])
    ref = ref_vae.AutoencoderKL(autoencoder_path=None, ddconfig=ddconfig).eval()

    params = jax.tree.map(
        jnp.asarray, torch_import.import_kl_vae(_to_numpy_sd(ref))
    )
    model = KLVae(embed_dim=16)

    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        post = ref.encode(torch.from_numpy(x))
        want_mean = post.mean.numpy()
        want_logvar = post.logvar.numpy()
        want_dec = ref.decode(post.mean).numpy()

    got_mean, got_logvar = model.apply(
        {"params": params}, jnp.asarray(x), method=KLVae.encode
    )
    np.testing.assert_allclose(want_mean, np.asarray(got_mean), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(want_logvar, np.asarray(got_logvar), rtol=1e-3, atol=1e-4)

    got_dec = model.apply(
        {"params": params}, jnp.asarray(want_mean), method=KLVae.decode
    )
    np.testing.assert_allclose(want_dec, np.asarray(got_dec), rtol=1e-3, atol=2e-4)


def test_denoiser_zero_init_output():
    """Final layer and AdaLN modulations are zero-init -> output must be zero."""
    m = MlpDenoiser(in_channels=4, model_channels=32, out_channels=8, z_channels=16, depth=2)
    k = jax.random.PRNGKey(0)
    x = jnp.ones((2, 4))
    t = jnp.zeros((2,), dtype=jnp.int32)
    c = jnp.ones((2, 16))
    params = m.init(k, x, t, c)["params"]
    out = m.apply({"params": params}, x, t, c)
    assert np.allclose(np.asarray(out), 0.0)
