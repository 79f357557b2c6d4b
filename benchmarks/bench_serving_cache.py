import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy

B = int(os.environ.get("B", "32"))
policy = UnifiedVideoActionPolicy(
    shape_meta={"action": {"shape": [2]}},
    vae_model_params={"autoencoder_path": None, "ddconfig": {"vae_embed_dim": 16, "ch_mult": [1,1,2,2,4]}},
    autoregressive_model_params={"model_size": "mar_base", "img_size": 256,
        "num_sampling_steps": "100", "act_diff_testing_steps": "100",
        "temperature": 0.95, "pretrained_model_path": None},
    action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
    task_name="pusht", compute_dtype="bfloat16",
)
params = policy.init_params(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)

def fresh_obs(i):
    return {"image": rng.rand(B, 16, 3, 96, 96).astype(np.float32)}

key = jax.random.PRNGKey(1)
# warm both paths
_, cache = policy.predict_action_cached(params, fresh_obs(0), key, cache=None)
_, cache = policy.predict_action_cached(params, fresh_obs(1), key, cache=cache)

# sequential rollout-style: uncached
t0 = time.perf_counter()
for i in range(6):
    key, sub = jax.random.split(key)
    policy.predict_action(params, fresh_obs(i), sub)
t_un = (time.perf_counter()-t0)/6
print(f"uncached predict: {t_un*1e3:.1f} ms/call -> {B/t_un:.1f} chunks/s", flush=True)

# cached
cache = None
t0 = time.perf_counter()
for i in range(6):
    key, sub = jax.random.split(key)
    _, cache = policy.predict_action_cached(params, fresh_obs(i), sub, cache=cache)
t_c = (time.perf_counter()-t0)/6
print(f"cached predict  : {t_c*1e3:.1f} ms/call -> {B/t_c:.1f} chunks/s", flush=True)
