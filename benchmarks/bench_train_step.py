"""Training-step throughput on the real chip (mar_base, PushT shapes).

One jitted train step: VAE encode (frozen) + MAR forward/backward + AdamW +
EMA, per task mode. Reports samples/s/chip and delivered TF/s against the
~2 TF/sample fwd+bwd estimate (MAR fwd 0.46 ×3 for bwd + frozen VAE fwd
0.51 + heads). Reference anchor: the published recipe is ~2 days for stage 1
on 8×H100 (README.md:214-216) — no per-step numbers exist, so this table is
the framework's own training baseline.
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
from unified_video_action_tpu.training.optim import make_optimizer
from unified_video_action_tpu.training.train_state import create_train_state
from unified_video_action_tpu.training.train_state import EmaConfig, make_train_step

B = int(os.environ.get("B", "16"))
ITERS = int(os.environ.get("ITERS", "5"))
MODES = os.environ.get("MODES", "policy_model,video_model").split(",")

policy = UnifiedVideoActionPolicy(
    shape_meta={"action": {"shape": [2]}, "obs": {
        "image": {"shape": [3, 96, 96], "type": "rgb"},
        "agent_pos": {"shape": [2], "type": "low_dim"},
    }},
    vae_model_params={
        "autoencoder_path": None,
        "ddconfig": {"vae_embed_dim": 16, "ch_mult": [1, 1, 2, 2, 4]},
    },
    autoregressive_model_params={
        "model_size": "mar_base",
        "img_size": 256,
        "num_sampling_steps": "100",
        "act_diff_testing_steps": "100",
        "pretrained_model_path": None,
    },
    action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
    task_name="pusht",
    compute_dtype="bfloat16",
)
params = policy.init_params(jax.random.PRNGKey(0))
tx = make_optimizer()
state = create_train_state(policy, params, tx)
train_step = make_train_step(policy, tx, EmaConfig())

rng = np.random.RandomState(0)
T = 32
batch = {
    "obs": {
        "image": jax.device_put(
            rng.rand(B, T, 3, 96, 96).astype(np.float32)
        ),
        "agent_pos": jax.device_put(rng.rand(B, T, 2).astype(np.float32)),
    },
    "action": jax.device_put(rng.rand(B, T, 2).astype(np.float32)),
}
key = jax.random.PRNGKey(1)
from unified_video_action_tpu.utils import frames as frame_util

idx = frame_util.select_frame_indices(T, eval=False)

for mode in MODES:
    # warmup/compile
    state, m = train_step(state, batch, key, mode, idx)
    float(jax.device_get(m["train_loss"]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = train_step(state, batch, jax.random.fold_in(key, i), mode, idx)
        float(jax.device_get(m["train_loss"]))
    dt = (time.perf_counter() - t0) / ITERS
    sps = B / dt
    tf = 2.0 * sps / 1.0  # ~2 TF/sample fwd+bwd
    print(
        f"{mode:18s} B={B}: {dt*1e3:7.1f} ms/step  {sps:6.1f} samples/s"
        f"  ~{tf:5.1f} TF/s delivered",
        flush=True,
    )
