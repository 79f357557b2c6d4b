#!/usr/bin/env python
"""Rollout wall-clock vs stream depth (VERDICT r2 #10).

Measures PushTImageRunner.run on the real chip at n_streams = 1, 2, 4 with a
fixed env count, latent-cache serving. The interleaved streams overlap host
env stepping with device compute; the curve shows where the overlap
saturates (host-bound beyond ~2 streams on a 1-vCPU host).

Usage: python benchmarks/bench_rollout_streams.py [--envs 12] [--steps 64]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=12)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--model", default="mar_small")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy
    from unified_video_action_tpu.runners.pusht_runner import PushTImageRunner

    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [2]}},
        vae_model_params={
            "autoencoder_path": None,
            "ddconfig": {"vae_embed_dim": 16, "ch_mult": [1, 1, 2, 2, 4], "ch": 64},
        },
        autoregressive_model_params={
            "model_size": args.model,
            "img_size": 96,
            "vae_stride": 16,
            "num_sampling_steps": "100",
            "act_diff_testing_steps": "100",
            "temperature": 0.95,
            "pretrained_model_path": None,
        },
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="pusht",
        compute_dtype="bfloat16",
    )
    params = policy.init_params(jax.random.PRNGKey(0))

    results = {}
    for n_streams in (1, 2, 4):
        runner = PushTImageRunner(
            n_train=0, n_test=args.envs, n_test_vis=0,
            max_steps=args.steps, latent_cache=True,
        )
        # warmup compile at this chunk size
        warm = PushTImageRunner(
            n_train=0, n_test=max(args.envs // max(n_streams, 1), 1),
            n_test_vis=0, max_steps=8, latent_cache=True,
        )
        warm.run(policy, params, n_streams=1)
        t0 = time.perf_counter()
        runner.run(policy, params, n_streams=n_streams)
        dt = time.perf_counter() - t0
        results[f"streams_{n_streams}_s"] = round(dt, 2)
        print(f"n_streams={n_streams}: {dt:.2f}s", flush=True)

    print(json.dumps({
        "bench": "rollout_wall_clock_vs_stream_depth",
        "envs": args.envs, "max_steps": args.steps, **results,
    }))


if __name__ == "__main__":
    main()
