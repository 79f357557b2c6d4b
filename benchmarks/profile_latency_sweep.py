"""Serving latency vs batch: steady-state cached rollout step on the chip.

B=1 is the eval_real robot-serving case (ZMQ node, one observation per
request); larger batches are the sim-runner case. One row per batch:
p50 step latency (dispatch -> action on host) and chunks/s at depth 1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy

BATCHES = [int(b) for b in os.environ.get("BATCHES", "1,8,32,128").split(",")]
ITERS = int(os.environ.get("ITERS", "6"))

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
    vae_encode_chunk=64,
)
params = policy.init_params(jax.random.PRNGKey(0))
full_fn = policy._build_predict_cached_fn(4)
cached_fn = policy._build_predict_cached_fn(2)
key = jax.random.PRNGKey(1)
rng = np.random.RandomState(0)

for B in BATCHES:
    first = jax.device_put(
        rng.randint(0, 255, (B, 4, 3, 96, 96)).astype(np.uint8)
    )
    fresh = [
        jax.device_put(rng.randint(0, 255, (B, 2, 3, 96, 96)).astype(np.uint8))
        for _ in range(ITERS + 2)
    ]
    empty = jax.device_put(np.zeros((B, 0, *policy._latent_shape()), np.float32))
    _, cache = full_fn(params, first, empty, key)
    lat = []
    for i in range(ITERS + 2):
        t0 = time.perf_counter()
        nact, cache = cached_fn(
            params, fresh[i], cache[:, [2, 3]], jax.random.fold_in(key, i)
        )
        np.asarray(jax.device_get(nact))
        if i >= 2:
            lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50))
    print(
        f"B={B:4d}  p50 {p50*1e3:8.1f} ms/step   {B/p50:7.1f} chunks/s",
        flush=True,
    )
