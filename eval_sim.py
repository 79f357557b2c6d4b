#!/usr/bin/env python
"""Simulation evaluation entry point.

Equivalent of the reference's eval_sim.py (eval_sim.py:20-92): load a
checkpoint (this framework's orbax format, which embeds cfg + normalizer, or a
reference torch .ckpt via the import adapters), rebuild the policy with the
EMA weights, run the task's env runner, and dump ``eval_log_<name>.json``.
"""

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("--config-name", default="uva_pusht")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import numpy as np

    from unified_video_action_tpu.config import CONFIG_ROOT, load_config
    from unified_video_action_tpu.training.workspace import TrainWorkspace
    from unified_video_action_tpu.training import checkpoint as ckpt_lib
    from unified_video_action_tpu.training.optim import make_optimizer
    from unified_video_action_tpu.training.train_state import create_train_state

    os.makedirs(args.output_dir, exist_ok=True)

    ckpt_meta_path = os.path.join(args.checkpoint, "meta.json")
    if os.path.isdir(args.checkpoint) and os.path.exists(ckpt_meta_path):
        with open(ckpt_meta_path) as f:
            meta = json.load(f)
        cfg = meta.get("cfg")
        if cfg is None:
            cfg = load_config(args.config_name, overrides=args.overrides)
        else:
            from unified_video_action_tpu.config import Cfg, apply_overrides

            cfg = Cfg.wrap(cfg)
            # CLI overrides still apply on top of the embedded train cfg
            # (e.g. restoring the full 50-seed test protocol after training
            # with a trimmed env_runner.n_test)
            apply_overrides(cfg, args.overrides)
    else:
        cfg = load_config(args.config_name, overrides=args.overrides)

    ws = TrainWorkspace(cfg, output_dir=args.output_dir)
    policy = ws.policy
    params = policy.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer()
    state = create_train_state(policy, params, tx)
    if os.path.isdir(args.checkpoint) and os.path.exists(ckpt_meta_path):
        state, meta, normalizer = ckpt_lib.load_checkpoint(args.checkpoint, state)
        if normalizer is not None:
            policy.set_normalizer(normalizer)
    elif args.checkpoint.endswith((".ckpt", ".pth")):
        # reference torch checkpoint: policy-level partial load
        policy.pretrained_model_path = args.checkpoint
        params = policy.load_pretrained(params)
        state = create_train_state(policy, params, tx)
        state = state.replace(ema_params=state.mar_params)

    eval_params = {"mar": state.ema_params, "vae": state.vae_params}

    from unified_video_action_tpu.runners.base import env_rollout, load_env_runner

    runners = load_env_runner(cfg, output_dir=args.output_dir)
    log = env_rollout(policy, eval_params, runners, jax.random.PRNGKey(0))

    # Provenance stamps: tie this evidence to the exact artifact + serving
    # config evaluated, so bench.py's quality gates can refuse logs that
    # describe different weights or a different sampler than they serve.
    from unified_video_action_tpu.utils.ckpt_id import ckpt_digest

    log["ckpt_source"] = args.checkpoint
    log["ckpt_digest"] = ckpt_digest(args.checkpoint)
    log["act_steps"] = str(policy.mar_cfg.act_diff_testing_steps)
    log["serving_quant"] = policy.serving_quant or "bf16"
    log["obs_codec"] = policy.obs_codec or "raw"

    name = os.path.basename(os.path.normpath(args.checkpoint))
    if "stub" in log.get("env_backend", ""):
        name += ".STUB"  # stub-backed logs are self-identifying by filename too
    out_path = os.path.join(args.output_dir, f"eval_log_{name}.json")
    with open(out_path, "w") as f:
        json.dump(log, f, indent=2, sort_keys=True)
    print(json.dumps({k: v for k, v in log.items() if "mean_score" in k}, indent=2))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
