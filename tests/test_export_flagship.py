"""scripts/export_flagship.py: slim deployment export round-trip.

The export is the cross-round persistence mechanism (data/ is wiped by
environment resets): EMA weights (bf16) + VAE + normalizer + embedded cfg in
an orbax dir that must load through BOTH consumer paths — eval_sim's
``load_checkpoint`` (slim branch) and the policy's ``_load_mar_ckpt`` stage
bootstrap used by bench.py's deployed tier."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from tests.test_end_to_end import _tiny_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_slim_export_round_trip(tmp_path):
    from unified_video_action_tpu.training import checkpoint as ckpt_lib
    from unified_video_action_tpu.training.optim import make_optimizer
    from unified_video_action_tpu.training.train_state import create_train_state
    from unified_video_action_tpu.training.workspace import TrainWorkspace

    cfg = _tiny_cfg(tmp_path)
    ws = TrainWorkspace(cfg, output_dir=str(tmp_path / "run"))
    policy = ws.policy
    params = policy.init_params(jax.random.PRNGKey(0))
    state = create_train_state(policy, params, make_optimizer())
    # make EMA distinguishable from raw params so the export provably
    # prefers the EMA tree
    state = state.replace(
        ema_params=jax.tree.map(lambda x: x + 1.0, state.mar_params)
    )

    src = tmp_path / "ckpt"
    cfg_dict = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
    ckpt_lib.save_checkpoint(str(src), state, cfg=cfg_dict, epoch=3)

    out = tmp_path / "export"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_flagship.py"),
         "--ckpt", str(src), "--out", str(out)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # slim payload: no optimizer moments, no duplicate raw params
    export_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(out) for f in fs
    )
    src_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(src) for f in fs
    )
    assert export_bytes < 0.45 * src_bytes  # ema-only + bf16 vs 4x fp32 trees

    # consumer 1: load_checkpoint (eval_sim path)
    fresh = create_train_state(
        policy, policy.init_params(jax.random.PRNGKey(1)), make_optimizer()
    )
    restored, meta, _norm = ckpt_lib.load_checkpoint(str(out), fresh)
    assert meta["slim"] is True and meta["epoch"] == 3
    want = jax.tree_util.tree_leaves(state.ema_params)
    got = jax.tree_util.tree_leaves(restored.ema_params)
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(w, np.float32), np.asarray(g, np.float32),
            rtol=8e-3, atol=8e-3,  # bf16 storage rounding
        )
    # eval uses ema; slim also mirrors it into mar_params
    got_raw = jax.tree_util.tree_leaves(restored.mar_params)
    for g, gr in zip(got, got_raw):
        assert np.array_equal(np.asarray(g), np.asarray(gr))
    # frozen VAE travels with the export
    v_want = jax.tree_util.tree_leaves(state.vae_params)
    v_got = jax.tree_util.tree_leaves(restored.vae_params)
    for w, g in zip(v_want, v_got):
        np.testing.assert_allclose(
            np.asarray(w, np.float32), np.asarray(g, np.float32),
            rtol=8e-3, atol=8e-3,
        )

    # consumer 2: policy stage-bootstrap / bench deployed tier
    init_tree = policy.init_params(jax.random.PRNGKey(2))["mar"]
    merged = policy._load_mar_ckpt(str(out), init_tree)
    m_got = jax.tree_util.tree_leaves(merged)
    for w, g in zip(want, m_got):
        np.testing.assert_allclose(
            np.asarray(w, np.float32), np.asarray(g, np.float32),
            rtol=8e-3, atol=8e-3,
        )
