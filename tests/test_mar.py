"""MAR unified transformer: wiring/shape/finiteness tests on a tiny config,
all five task modes + both sampling paths + importer round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unified_video_action_tpu.models.mar import (
    Mar,
    MarConfig,
    TASK_MODES,
    patchify,
    unpatchify,
    random_spatial_mask,
    sample_mask_rate,
)

TINY = MarConfig(
    img_size=32,
    vae_stride=8,            # seq_hw = 4, seq_len = 16
    vae_embed_dim=8,
    encoder_embed_dim=64,
    encoder_depth=2,
    encoder_num_heads=4,
    decoder_embed_dim=64,
    decoder_depth=2,
    decoder_num_heads=4,
    diffloss_d=2,
    diffloss_w=32,
    diffloss_act_d=2,
    diffloss_act_w=32,
    num_sampling_steps="4",
    act_diff_testing_steps="4",
    action_dim=2,
    attn_dropout=0.0,
    proj_dropout=0.0,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = Mar(TINY)
    B, T, C, H, W = 2, 4, TINY.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, C, H, W))
    cond = jax.random.normal(key, (B, T, C, H, W))
    actions = jax.random.normal(key, (B, 16, TINY.action_dim))
    params = model.init(
        {"params": key, "dropout": key},
        x, cond, key, actions,
        method=Mar.init_forward,
    )["params"]
    return model, params


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 16, 16))
    tok = patchify(x, 1)
    assert tok.shape == (3, 256, 8)
    back = unpatchify(tok, 1, 8, 16)
    np.testing.assert_allclose(np.asarray(x), np.asarray(back))

    tok2 = patchify(x, 2)
    assert tok2.shape == (3, 64, 32)
    back2 = unpatchify(tok2, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(x), np.asarray(back2))


def test_mask_rate_bounds():
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    rates = jax.vmap(lambda k: sample_mask_rate(k, 0.7))(keys)
    assert float(rates.min()) >= 0.7
    assert float(rates.max()) <= 1.0


def test_random_mask_counts():
    key = jax.random.PRNGKey(1)
    rate = jnp.asarray(0.75)
    m = random_spatial_mask(key, 8, 16, rate)
    counts = np.asarray(m.sum(axis=-1))
    np.testing.assert_array_equal(counts, np.full(8, 12.0))


@pytest.mark.parametrize("mode", TASK_MODES)
def test_forward_all_modes(tiny_model, mode):
    model, params = tiny_model
    B, T, C, H, W = 2, 4, TINY.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, T, C, H, W))
    cond = jax.random.normal(key, (B, T, C, H, W))
    actions = jax.random.normal(key, (B, 16, TINY.action_dim))
    loss, vloss, aloss = model.apply(
        {"params": params},
        x, cond, mode, key, actions=actions, train=True,
        rngs={"dropout": key},
    )
    assert np.isfinite(float(loss))
    if mode in ("video_model", "dynamic_model"):
        assert float(aloss) == 0.0 and float(vloss) > 0.0
    elif mode in ("policy_model", "inverse_model"):
        assert float(vloss) == 0.0 and float(aloss) > 0.0
    else:
        assert float(vloss) > 0.0 and float(aloss) > 0.0


def test_sample_policy(tiny_model):
    model, params = tiny_model
    B, T, C, H, W = 2, 4, TINY.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(3)
    cond = jax.random.normal(key, (B, T, C, H, W))
    act = model.apply(
        {"params": params}, cond, key, method=Mar.sample_policy,
    )
    assert act.shape == (B, 16, TINY.action_dim)
    assert np.isfinite(np.asarray(act)).all()
    # actions head samples with clip_denoised=True -> bounded
    assert float(jnp.abs(act).max()) <= 1.0 + 1e-5


def test_sample_video_maskgit(tiny_model):
    model, params = tiny_model
    B, T, C, H, W = 2, 4, TINY.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(4)
    cond = jax.random.normal(key, (B, T, C, H, W))
    frames, act = model.apply(
        {"params": params}, cond, key, num_iter=3,
        method=Mar.sample_video,
    )
    assert frames.shape == (B * T, C, H, W)
    assert act.shape == (B, 16, TINY.action_dim)
    assert np.isfinite(np.asarray(frames)).all()


def test_jit_policy_path(tiny_model):
    """The whole policy fast path must jit cleanly (static shapes)."""
    model, params = tiny_model
    B, T, C, H, W = 2, 4, TINY.vae_embed_dim, 4, 4

    @jax.jit
    def run(p, cond, key):
        return model.apply({"params": p}, cond, key, method=Mar.sample_policy)

    key = jax.random.PRNGKey(5)
    cond = jax.random.normal(key, (B, T, C, H, W))
    a1 = run(params, cond, key)
    a2 = run(params, cond, jax.random.PRNGKey(6))
    assert a1.shape == (B, 16, TINY.action_dim)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))  # rng actually used


def test_importer_roundtrip(tiny_model):
    """Fabricate a torch-style state dict from the init tree's shapes, import
    it, and check the merged tree covers the same leaves."""
    from unified_video_action_tpu.models import torch_import

    model, params = tiny_model
    rng = np.random.RandomState(0)
    sd = {}

    def lin(name, kernel):
        sd[name + ".weight"] = np.ascontiguousarray(np.asarray(kernel).T)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [p.key for p in path]
        # only exercise a couple of representative leaves
        if keys[:2] == ["encoder_blocks", "block_0"] and keys[-1] == "kernel":
            pass
    # build a minimal torch sd for one ViT block and check it lands correctly
    D = TINY.encoder_embed_dim
    qkv_w = rng.randn(3 * D, D).astype(np.float32)
    sd = {"encoder_blocks.0.attn.qkv.weight": qkv_w}
    tree = torch_import.import_mar(sd, encoder_depth=1, decoder_depth=0)
    got = tree["encoder_blocks"]["block_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(got, qkv_w.T)
    merged, skipped = torch_import.merge_params(params, tree)
    assert not skipped
    np.testing.assert_allclose(
        merged["encoder_blocks"]["block_0"]["attn"]["qkv"]["kernel"], qkv_w.T
    )


def test_wrist_image_variant():
    """predict_wrist_img: second decoder head + 4-stream fusion (toolhang)."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, predict_wrist_img=True, use_proprioception=True,
        proprio_dim=9, proprio_use_image=True,
    )
    model = Mar(cfg)
    B, T, C, H, W = 2, 4, cfg.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, C, H, W))
    cond = jax.random.normal(key, (B, T, C, H, W))
    actions = jax.random.normal(key, (B, 16, cfg.action_dim))
    proprio = {
        "state": jax.random.normal(key, (B, 4, 9)),
        "second_image": jax.random.normal(key, (B, T, C, H, W)),
        "pred_second_image": jax.random.normal(key, (B, T, C, H, W)),
    }
    params = model.init(
        {"params": key, "dropout": key},
        x, cond, key, actions, proprio=proprio,
        method=Mar.init_forward,
    )["params"]
    assert "diffloss_wrist" in params and "z_proj_wrist" in params

    loss, vl, al = model.apply(
        {"params": params},
        x, cond, "full_dynamic_model", key,
        actions=actions, proprio=proprio, train=True,
        rngs={"dropout": key},
    )
    assert np.isfinite(float(loss)) and float(vl) > 0.0 and float(al) > 0.0

    # video sampling returns the wrist stream (reference quirk, :1156-1158)
    frames, act = model.apply(
        {"params": params}, cond, key, num_iter=2,
        proprio={"state": proprio["state"], "second_image": proprio["second_image"]},
        method=Mar.sample_video,
    )
    assert frames.shape == (B * T, C, H, W)
    assert np.isfinite(np.asarray(frames)).all()


@pytest.mark.parametrize("variant", ["conv_ori", "conv2", "fc2"])
def test_action_pool_variants(variant):
    """Alternative DiffActLoss poolings produce a valid (B, 16, A) chunk."""
    from unified_video_action_tpu.models.heads import ActionDiffusionHead

    head = ActionDiffusionHead(
        target_channels=2, z_channels=64, width=32, depth=1,
        num_actions=16, act_diff_testing_steps="2",
        act_model_type=variant,
    )
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (2, 64, 64))  # (B, T*S=4*16, D)
    target = jax.random.normal(key, (2, 16, 2))
    params = head.init({"params": key}, target, z, key)["params"]
    loss = head.apply({"params": params}, target, z, key)
    assert np.isfinite(float(loss))
    act = head.apply({"params": params}, z, key, method=ActionDiffusionHead.sample)
    assert act.shape == (2, 16, 2)
    assert np.isfinite(np.asarray(act)).all()


# ----------------------------------------------------------------------
# classifier-free guidance (batch-duplicated, MAR-style)
# ----------------------------------------------------------------------

import dataclasses as _dc

TINY_CLIP = _dc.replace(TINY, language_emb_model="clip")


@pytest.fixture(scope="module")
def tiny_clip_model():
    model = Mar(TINY_CLIP)
    B, T, C, H, W = 2, 4, TINY_CLIP.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, C, H, W))
    cond = jax.random.normal(key, (B, T, C, H, W))
    actions = jax.random.normal(key, (B, 16, TINY_CLIP.action_dim))
    text = jax.random.normal(key, (B, 512))
    params = model.init(
        {"params": key, "dropout": key},
        x, cond, key, actions, text,
        method=Mar.init_forward,
    )["params"]
    return model, params


def test_sample_video_cfg_runs(tiny_clip_model):
    """cfg>1 video sampling (batch-duplicated CFG, Muse linear schedule) runs
    with correct shapes and finite values (mar_con_unified.py:1085-1107)."""
    model, params = tiny_clip_model
    B, T, C, H, W = 2, 4, TINY_CLIP.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(5)
    cond = jax.random.normal(key, (B, T, C, H, W))
    text = jax.random.normal(key, (B, 512))
    frames, act = model.apply(
        {"params": params}, cond, key, num_iter=3, cfg=1.5,
        text_latents=text,
        method=Mar.sample_video,
    )
    assert frames.shape == (B * T, C, H, W)
    assert act.shape == (B, 16, TINY_CLIP.action_dim)
    assert np.isfinite(np.asarray(frames)).all()
    assert np.isfinite(np.asarray(act)).all()


def test_cfg_noop_when_uncond_equals_cond(tiny_clip_model):
    """When the projected text equals the fake latent (cond == uncond), the
    guided eps reduces to the conditional eps for EVERY cfg scale, so any two
    cfg values must produce bit-identical videos under the same key. Catches
    half-batch misalignment in the duplicated-CFG plumbing."""
    model, params = tiny_clip_model
    import flax

    params = flax.core.unfreeze(params)
    D = TINY_CLIP.encoder_embed_dim
    fake = np.asarray(params["fake_latent"])  # (1, D)
    params["text_proj_cond"] = {
        "kernel": jnp.zeros((512, D)),
        "bias": jnp.asarray(fake[0]),
    }
    B, T, C, H, W = 2, 4, TINY_CLIP.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(6)
    cond = jax.random.normal(key, (B, T, C, H, W))
    text = jax.random.normal(key, (B, 512))
    outs = []
    for cfg in (3.0, 7.0):
        frames, act = model.apply(
            {"params": params}, cond, key, num_iter=2, cfg=cfg,
            text_latents=text,
            method=Mar.sample_video,
        )
        outs.append((np.asarray(frames), np.asarray(act)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_cfg_rejected_without_text(tiny_model):
    model, params = tiny_model
    B, T, C, H, W = 2, 4, TINY.vae_embed_dim, 4, 4
    key = jax.random.PRNGKey(7)
    cond = jax.random.normal(key, (B, T, C, H, W))
    with pytest.raises(ValueError, match="cfg"):
        model.apply(
            {"params": params}, cond, key, num_iter=2, cfg=2.0,
            method=Mar.sample_video,
        )
