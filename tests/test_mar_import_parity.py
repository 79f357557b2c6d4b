"""Full-MAR checkpoint-import parity vs the torch reference.

Instantiates the reference ``MAR`` (mar_con_unified.py:28-1234) at a small
config with randomized weights, imports its state dict through
``torch_import.import_mar``, and asserts numerical parity on deterministic
surfaces for ALL task modes and the key config variants (pusht / umi with
clip+history+proprio / toolhang with image-proprio / wrist):

1. importer coverage: every torch state-dict entry maps to a flax leaf;
2. encoder+decoder ``z`` parity per task mode (pinned mask/inputs, eval mode);
3. forward losses per task mode with pinned diffusion t/noise (torch RNG
   monkeypatched; our heads replayed with the same draws);
4. policy-mode action sampling with a pinned per-step noise sequence through
   the full respaced ancestral sampler (pool -> AdaLN MLP -> p_sample chain).

Any wrong key map, transpose, or layout in the ~40-entry importer, or any
behavioral drift in encoder/decoder/head glue, fails these tests.

The geometry keeps S=256 (16x16 latents) because the reference hard-codes
repeat_interleave(64) token expansion and the 16x16 conv_fc grid
(mar_con_unified.py:525-585, diffusion_action_loss.py:36-44); widths/depths
are shrunk instead.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests._reference import requires_reference, import_reference_module
from tests import _timm_stub

from unified_video_action_tpu.models import torch_import
from unified_video_action_tpu.models.denoiser import MlpDenoiser
from unified_video_action_tpu.models.diffusion import create_diffusion
from unified_video_action_tpu.models.heads import ConvFcPool
from unified_video_action_tpu.models.mar import Mar, MarConfig

pytestmark = requires_reference

B, T, S, C_TOK, D = 2, 4, 256, 8, 64
L = T * S  # 1024
N_ACT = 16

DIMS = dict(
    encoder_embed_dim=D, encoder_depth=2, encoder_num_heads=4,
    decoder_embed_dim=D, decoder_depth=2, decoder_num_heads=4,
    mlp_ratio=4.0, attn_dropout=0.0, proj_dropout=0.0,
    diffloss_d=2, diffloss_w=32, diffloss_act_d=2, diffloss_act_w=32,
)

CASES = {
    # act_dim, language, history, proprio(dim or None), proprio_image,
    # wrist, prop_pred(dim or None), task_name
    "pusht": dict(act_dim=2, language=None, hist=False, proprio=None,
                  proprio_image=False, wrist=False, prop_pred=None,
                  task="pusht"),
    "umi": dict(act_dim=10, language="clip", hist=True, proprio=16,
                proprio_image=False, wrist=False, prop_pred=6, task="umi"),
    "toolhang": dict(act_dim=10, language=None, hist=False, proprio=9,
                     proprio_image=True, wrist=False, prop_pred=9,
                     task="toolhang"),
    "human_wrist": dict(act_dim=14, language=None, hist=False, proprio=None,
                        proprio_image=False, wrist=True, prop_pred=None,
                        task="human_pp"),
}

TASK_MODES = ("video_model", "dynamic_model", "policy_model",
              "inverse_model", "full_dynamic_model")


def _build_reference(case):
    import torch

    _timm_stub.install()
    ref_mod = import_reference_module(
        "unified_video_action.model.autoregressive.mar_con_unified"
    )
    ref = ref_mod.MAR(
        img_size=32, vae_stride=2, patch_size=1, vae_embed_dim=C_TOK,
        encoder_embed_dim=D, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=D, decoder_depth=2, decoder_num_heads=4,
        mlp_ratio=4.0, attn_dropout=0.0, proj_dropout=0.0,
        diffloss_d=2, diffloss_w=32, diffloss_act_d=2, diffloss_act_w=32,
        num_sampling_steps="100", act_diff_training_steps=1000,
        act_diff_testing_steps="25",
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name=case["task"],
        different_history_freq=False,
        use_history_action=case["hist"],
        action_mask_ratio=0.5,
        use_proprioception=case["proprio"] is not None,
        predict_wrist_img=case["wrist"],
        predict_proprioception=case["prop_pred"] is not None,
        language_emb_model=case["language"],
        shape_meta={"action": {"shape": [case["act_dim"]]}},
    )
    # Randomize every parameter (default init leaves the fake latents and pos
    # embeds at zero, which would hide wrong key maps).
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * 0.05)
    ref.eval()
    ref.device = "cpu"
    return ref


def _our_config(case):
    return MarConfig(
        img_size=32, vae_stride=2, patch_size=1, vae_embed_dim=C_TOK,
        **DIMS,
        num_sampling_steps="100", act_diff_training_steps=1000,
        act_diff_testing_steps="25",
        action_dim=case["act_dim"],
        language_emb_model=case["language"],
        use_history_action=case["hist"],
        use_proprioception=case["proprio"] is not None,
        proprio_dim=case["proprio"] or 0,
        proprio_use_image=case["proprio_image"],
        predict_wrist_img=case["wrist"],
        predict_proprioception=case["prop_pred"] is not None,
        proprio_pred_dim=case["prop_pred"] or 0,
        task_name=case["task"],
    )


def _make_inputs(case, seed=7):
    """Pinned numpy inputs shared by both implementations."""
    rng = np.random.RandomState(seed)
    f32 = lambda *s: rng.randn(*s).astype(np.float32)
    d = {
        "x_tokens": f32(B, T, S, C_TOK),
        "cond_tokens": f32(B, T, S, C_TOK),
        "mask": np.broadcast_to(
            (rng.rand(B, 1, S) < 0.75).astype(np.float32), (B, T, S)
        ).copy(),
        "actions": f32(B, N_ACT, case["act_dim"]),
        "history": f32(B, N_ACT, case["act_dim"]) if case["hist"] else None,
        "text": f32(B, 512) if case["language"] == "clip" else None,
    }
    ref_prop, our_prop = {}, {}
    if case["proprio"] == 16:  # umi layout: pos3 + rot3 + grip1 + wrt_start9
        fields = [("robot0_eef_pos", 3), ("robot0_eef_rot_axis_angle", 3),
                  ("robot0_gripper_width", 1),
                  ("robot0_eef_rot_axis_angle_wrt_start", 9)]
        arrs = [f32(B, N_ACT, w) for _, w in fields]
        ref_prop = {k: a for (k, _), a in zip(fields, arrs)}
        our_prop["state"] = np.concatenate(arrs, axis=-1)
    elif case["proprio"] == 9:  # robomimic layout: pos3 + quat4 + gripper2
        fields = [("robot0_eef_pos", 3), ("robot0_eef_quat", 4),
                  ("robot0_gripper_qpos", 2)]
        arrs = [f32(B, N_ACT, w) for _, w in fields]
        ref_prop = {k: a for (k, _), a in zip(fields, arrs)}
        our_prop["state"] = np.concatenate(arrs, axis=-1)
    if case["proprio_image"]:
        tok = f32(B, T, S, C_TOK)
        ref_prop["second_image_z"] = tok
        our_prop["second_image_tokens"] = tok
    if case["wrist"]:
        tok = f32(B, T, S, C_TOK)
        ref_prop["pred_second_image_z"] = tok
        our_prop["pred_second_image_tokens"] = tok
    d["ref_prop"], d["our_prop"] = ref_prop, our_prop
    if case["prop_pred"]:
        d["prop_target"] = f32(B, N_ACT, case["prop_pred"])
    return d


@pytest.fixture(scope="module", params=sorted(CASES))
def pair(request):
    """(case name, reference MAR, our Mar + imported params, pinned inputs)."""
    case = CASES[request.param]
    ref = _build_reference(case)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    imported = torch_import.import_mar(
        sd, encoder_depth=2, decoder_depth=2,
        diffloss_depth=2, diffloss_act_depth=2,
    )
    # every torch entry must land on exactly one flax leaf
    assert len(jax.tree.leaves(imported)) == len(sd), (
        len(jax.tree.leaves(imported)), len(sd))

    cfg = _our_config(case)
    model = Mar(cfg)
    inp = _make_inputs(case)
    key = jax.random.PRNGKey(0)
    # init_forward takes frame latents (B, T, C, H, W); zeros suffice for
    # shape-driven flax init.
    frames = jnp.zeros((B, T, C_TOK, 16, 16), jnp.float32)
    init_kwargs = {}
    if inp["text"] is not None:
        init_kwargs["text_latents"] = jnp.asarray(inp["text"])
    if case["proprio"] is not None or case["wrist"]:
        pr = {}
        if "state" in inp["our_prop"]:
            pr["state"] = jnp.asarray(inp["our_prop"]["state"])
        if case["proprio_image"]:
            pr["second_image"] = frames
        if case["wrist"]:
            pr["pred_second_image"] = frames
        init_kwargs["proprio"] = pr
    if case["prop_pred"]:
        init_kwargs["proprio_target"] = jnp.asarray(inp["prop_target"])
    params0 = model.init(
        {"params": key, "dropout": key},
        frames, frames, key, jnp.asarray(inp["actions"]),
        method=Mar.init_forward, **init_kwargs,
    )["params"]
    params, skipped = torch_import.merge_params(params0, imported)
    assert not skipped, f"importer produced unusable paths: {skipped}"
    return request.param, case, ref, model, params, inp


def _ref_prop_tensors(inp):
    import torch

    return {k: torch.from_numpy(v) for k, v in inp["ref_prop"].items()}


def _our_prop_tensors(inp):
    return {k: jnp.asarray(v) for k, v in inp["our_prop"].items()}


def _projected_text(ref, inp):
    """Project raw CLIP features with the reference weights on both sides
    (both encoders expect already-projected text)."""
    if inp["text"] is None:
        return None, None
    import torch

    with torch.no_grad():
        t_ref = ref.text_proj_cond(torch.from_numpy(inp["text"]))
    return t_ref, jnp.asarray(t_ref.numpy())


def _z_both(ref, model, params, inp, mode):
    """Encoder+decoder z from both implementations on pinned inputs."""
    import torch

    t_ref, t_our = _projected_text(ref, inp)
    with torch.no_grad():
        h_ref = ref.forward_mae_encoder(
            torch.from_numpy(inp["x_tokens"]),
            torch.from_numpy(inp["mask"]),
            torch.from_numpy(inp["cond_tokens"]),
            text_latents=t_ref,
            history_nactions=(
                torch.from_numpy(inp["history"]) if inp["history"] is not None
                else None
            ),
            nactions=torch.from_numpy(inp["actions"]),
            task_mode=mode,
            proprioception_input=_ref_prop_tensors(inp),
        )
        z_ref = ref.forward_mae_decoder(
            h_ref, torch.from_numpy(inp["mask"])
        ).numpy()

    h = model.apply(
        {"params": params},
        jnp.asarray(inp["x_tokens"]),
        jnp.asarray(inp["mask"]),
        jnp.asarray(inp["cond_tokens"]),
        mode,
        text_latents=t_our,
        history_actions=(
            jnp.asarray(inp["history"]) if inp["history"] is not None else None
        ),
        actions=jnp.asarray(inp["actions"]),
        proprio=_our_prop_tensors(inp) or None,
        train=False,
        method=Mar.forward_encoder,
    )
    z_our = np.asarray(
        model.apply({"params": params}, h, train=False,
                    method=Mar.forward_decoder)
    )
    return z_ref, z_our


@pytest.mark.parametrize("mode", TASK_MODES)
def test_encoder_decoder_z_parity(pair, mode):
    _, case, ref, model, params, inp = pair
    z_ref, z_our = _z_both(ref, model, params, inp, mode)
    assert z_ref.shape == z_our.shape == (B, L, D)
    np.testing.assert_allclose(z_ref, z_our, atol=3e-4, rtol=1e-3)


def _ref_pool_conv_fc(dal, z):
    """Replicate DiffActLoss conv_fc pooling (diffusion_action_loss.py:112-124)
    to expose the deterministic pooled latents."""
    from einops import rearrange

    zz = rearrange(z, "b (t s) c -> (b t) s c", t=dal.n_frames)
    zz = rearrange(zz, "b (w h) c -> b w h c", w=dal.w)
    zz = rearrange(zz, "b w h c -> b c w h")
    zz = dal.conv(zz)
    zz = rearrange(zz, "b c w h -> b (c w h)")
    zz = dal.fc(zz)
    zz = rearrange(zz, "(b t) c -> b t c", t=dal.n_frames)
    zz = dal.interpolate(zz.permute(0, 2, 1)).permute(0, 2, 1)
    return dal.refine(zz)


def test_action_pool_parity(pair):
    import torch

    _, case, ref, model, params, inp = pair
    z_ref, z_our = _z_both(ref, model, params, inp, "policy_model")
    with torch.no_grad():
        pooled_ref = _ref_pool_conv_fc(
            ref.diffactloss, torch.from_numpy(z_ref)
        ).numpy()
    pool = ConvFcPool(z_channels=D, n_frames=T, num_actions=N_ACT)
    pooled_our = np.asarray(
        pool.apply({"params": params["diffactloss"]["pool"]},
                   jnp.asarray(z_our))
    )
    np.testing.assert_allclose(pooled_ref, pooled_our, atol=3e-4, rtol=1e-3)


class _PinnedTorchRng:
    """Monkeypatch torch.randint / torch.randn_like to replay pinned draws,
    queued per shape in call order."""

    def __init__(self, monkeypatch, t_queue, noise_queue):
        import torch

        self._t = {k: list(v) for k, v in t_queue.items()}
        self._n = {k: list(v) for k, v in noise_queue.items()}

        def fake_randint(low, high, size, **kw):
            arr = self._t[tuple(size)].pop(0)
            return torch.from_numpy(np.asarray(arr)).long()

        def fake_randn_like(x, **kw):
            return torch.from_numpy(self._n[tuple(x.shape)].pop(0))

        monkeypatch.setattr(torch, "randint", fake_randint)
        monkeypatch.setattr(torch, "randn_like", fake_randn_like)


@pytest.mark.parametrize("mode", TASK_MODES)
def test_forward_loss_parity(pair, mode, monkeypatch):
    """forward_loss per task mode with pinned mask/t/noise on both sides."""
    import torch

    name, case, ref, model, params, inp = pair
    rng = np.random.RandomState(11)
    z_ref, z_our = _z_both(ref, model, params, inp, mode)
    gt = inp["x_tokens"].reshape(B, L, C_TOK)
    mask_flat = inp["mask"].reshape(B, L)
    act_dim = case["act_dim"]

    video_on = mode in ("video_model", "dynamic_model", "full_dynamic_model")
    act_on = mode in ("policy_model", "inverse_model", "full_dynamic_model")

    # pinned draws, queued in the reference's consumption order
    t_q, n_q = {}, {}
    draws = {}
    n_video_calls = (2 if case["wrist"] else 1) if video_on else 0
    for i in range(n_video_calls):
        draws[f"tv{i}"] = rng.randint(0, 1000, (B * L,)).astype(np.int64)
        draws[f"nv{i}"] = rng.randn(B * L, C_TOK).astype(np.float32)
    if act_on:
        draws["ta"] = rng.randint(0, 1000, (B * N_ACT,)).astype(np.int64)
        draws["na"] = rng.randn(B * N_ACT, act_dim).astype(np.float32)
    if case["prop_pred"]:
        draws["tp"] = rng.randint(0, 1000, (B * N_ACT,)).astype(np.int64)
        draws["np"] = rng.randn(B * N_ACT, case["prop_pred"]).astype(np.float32)
    for i in range(n_video_calls):
        t_q.setdefault((B * L,), []).append(draws[f"tv{i}"])
        n_q.setdefault((B * L, C_TOK), []).append(draws[f"nv{i}"])
    if act_on:
        t_q.setdefault((B * N_ACT,), []).append(draws["ta"])
        n_q.setdefault((B * N_ACT, act_dim), []).append(draws["na"])
    if case["prop_pred"]:
        t_q.setdefault((B * N_ACT,), []).append(draws["tp"])
        n_q.setdefault((B * N_ACT, case["prop_pred"]), []).append(draws["np"])

    _PinnedTorchRng(monkeypatch, t_q, n_q)
    kwargs = dict(
        z=torch.from_numpy(z_ref),
        target=torch.from_numpy(gt),
        mask=torch.from_numpy(mask_flat),
        nactions=torch.from_numpy(inp["actions"]),
        task_mode=mode,
    )
    if case["wrist"]:
        kwargs["gt_wrist_latents"] = torch.from_numpy(
            inp["ref_prop"]["pred_second_image_z"].reshape(B, L, C_TOK)
        )
    if case["prop_pred"]:
        kwargs["gt_properception"] = torch.from_numpy(inp["prop_target"])
    with torch.no_grad():
        loss_ref, vloss_ref, aloss_ref = ref.forward_loss(**kwargs)

    # ---- ours: same heads replayed with the identical pinned draws ----
    train_diff = create_diffusion("", noise_schedule="cosine")
    zf = jnp.asarray(z_our.reshape(B * L, D))

    def head_loss(net_params, target_flat, cond_flat, t, noise, in_ch):
        net = MlpDenoiser(in_channels=in_ch, model_channels=32,
                          out_channels=in_ch * 2, z_channels=D, depth=2)
        denoise = lambda x_t, tt: net.apply({"params": net_params}, x_t, tt,
                                            cond_flat)
        out = train_diff.training_losses(
            denoise, jnp.asarray(target_flat), jnp.asarray(t),
            noise=jnp.asarray(noise),
        )
        return out["loss"]

    vloss_our = jnp.zeros(())
    if video_on:
        lv = head_loss(params["diffloss"]["net"], gt.reshape(B * L, C_TOK),
                       zf, draws["tv0"], draws["nv0"], C_TOK)
        m = jnp.asarray(mask_flat.reshape(B * L))
        vloss_our = (lv * m).sum() / m.sum()
        if case["wrist"]:
            gw = inp["ref_prop"]["pred_second_image_z"].reshape(B * L, C_TOK)
            lw = head_loss(params["diffloss_wrist"]["net"], gw, zf,
                           draws["tv1"], draws["nv1"], C_TOK)
            vloss_our = vloss_our + (lw * m).sum() / m.sum()

    def pooled_flat(pool_params):
        pool = ConvFcPool(z_channels=D, n_frames=T, num_actions=N_ACT)
        p = pool.apply({"params": pool_params}, jnp.asarray(z_our))
        return p.reshape(B * N_ACT, D)

    aloss_our = jnp.zeros(())
    if act_on:
        la = head_loss(params["diffactloss"]["net"],
                       inp["actions"].reshape(B * N_ACT, act_dim),
                       pooled_flat(params["diffactloss"]["pool"]),
                       draws["ta"], draws["na"], act_dim)
        aloss_our = la.mean()
    loss_our = vloss_our + aloss_our
    if case["prop_pred"]:
        lp = head_loss(params["diffproploss"]["net"],
                       inp["prop_target"].reshape(B * N_ACT, case["prop_pred"]),
                       pooled_flat(params["diffproploss"]["pool"]),
                       draws["tp"], draws["np"], case["prop_pred"])
        loss_our = loss_our + lp.mean()

    np.testing.assert_allclose(float(vloss_ref), float(vloss_our),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(aloss_ref), float(aloss_our),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(loss_ref), float(loss_our),
                               rtol=2e-3, atol=2e-4)


def test_policy_sampling_parity(pair):
    """Policy-mode action chunk through the full 25-step respaced ancestral
    sampler with a pinned noise sequence (clip_denoised=True, temperature
    0.95), matching sample_tokens' policy early-exit path
    (mar_con_unified.py:1037-1047)."""
    import torch

    _, case, ref, model, params, inp = pair
    act_dim = case["act_dim"]
    z_ref, z_our = _z_both(ref, model, params, inp, "policy_model")

    rng = np.random.RandomState(21)
    steps = 25
    x0 = rng.randn(B * N_ACT, act_dim).astype(np.float32)
    step_noise = rng.randn(steps, B * N_ACT, act_dim).astype(np.float32)
    temp = 0.95

    # ---- reference rollout ----
    with torch.no_grad():
        pooled_ref = _ref_pool_conv_fc(
            ref.diffactloss, torch.from_numpy(z_ref)
        ).reshape(B * N_ACT, D)
        gen_ref = ref.diffactloss.gen_diffusion
        x = torch.from_numpy(x0.copy())
        for i in reversed(range(steps)):
            t = torch.full((B * N_ACT,), i, dtype=torch.long)
            out = gen_ref.p_mean_variance(
                ref.diffactloss.net, x, t, clip_denoised=True,
                model_kwargs={"c": pooled_ref},
            )
            nz = float(i != 0)
            x = out["mean"] + nz * torch.exp(
                0.5 * out["log_variance"]
            ) * torch.from_numpy(step_noise[steps - 1 - i]) * temp
        act_ref = x.numpy().reshape(B, N_ACT, act_dim)

    # ---- ours, identical noise ----
    gen = create_diffusion("25", noise_schedule="cosine")
    pool = ConvFcPool(z_channels=D, n_frames=T, num_actions=N_ACT)
    pooled = pool.apply(
        {"params": params["diffactloss"]["pool"]}, jnp.asarray(z_our)
    ).reshape(B * N_ACT, D)
    net = MlpDenoiser(in_channels=act_dim, model_channels=32,
                      out_channels=act_dim * 2, z_channels=D, depth=2)
    xj = jnp.asarray(x0)
    for i in reversed(range(steps)):
        t = jnp.full((B * N_ACT,), i, dtype=jnp.int32)
        mo = net.apply({"params": params["diffactloss"]["net"]},
                       xj, gen._map_t(t), pooled)
        o = gen.p_mean_variance(mo, xj, t, clip_denoised=True)
        nz = float(i != 0)
        xj = o["mean"] + nz * jnp.exp(0.5 * o["log_variance"]) * jnp.asarray(
            step_noise[steps - 1 - i]
        ) * temp
    act_our = np.asarray(xj).reshape(B, N_ACT, act_dim)

    np.testing.assert_allclose(act_ref, act_our, atol=2e-3, rtol=1e-2)
