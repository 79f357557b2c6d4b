import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import numpy as np
from unified_video_action_tpu.utils.profiling import benchmark_fn

B = int(os.environ.get("B", "32"))
# ---- 1. flash attention micro: XLA vs pallas at MAR shapes ----
from unified_video_action_tpu.ops.attention import flash_attention
H, N, D = 12, 1088, 64
k1,k2,k3 = jax.random.split(jax.random.PRNGKey(0),3)
q = jax.random.normal(k1,(B,N,H,D),dtype=jnp.bfloat16)
k = jax.random.normal(k2,(B,N,H,D),dtype=jnp.bfloat16)
v = jax.random.normal(k3,(B,N,H,D),dtype=jnp.bfloat16)

@jax.jit
def xla_attn(q,k,v):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D**-0.5)
    p = jax.nn.softmax(s.astype(jnp.float32),axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)

r1 = benchmark_fn(xla_attn, q,k,v, warmup=2, iters=20)
print("xla attn  :", round(r1["p50_s"]*1e3,3), "ms", flush=True)
r2 = benchmark_fn(lambda a,b,c: flash_attention(a,b,c), q,k,v, warmup=2, iters=20)
print("pallas attn:", round(r2["p50_s"]*1e3,3), "ms", flush=True)
# correctness on TPU
out_p = flash_attention(q,k,v)
out_x = xla_attn(q,k,v)
print("attn max diff:", float(jnp.abs(out_p.astype(jnp.float32)-out_x.astype(jnp.float32)).max()), flush=True)

# ---- 2. stage timings on the real policy ----
from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy
from unified_video_action_tpu.models.mar import Mar
from unified_video_action_tpu.models.vae import KLVae, sample_posterior, LATENT_SCALE

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
c = policy.mar_cfg

frames = jnp.zeros((B, 4, 3, 256, 256))
@jax.jit
def vae_encode(vp, f, key):
    return policy._encode_frames(vp, f, key)
r = benchmark_fn(vae_encode, params["vae"], frames, jax.random.PRNGKey(1), warmup=2, iters=10)
print("vae encode (B=32, 4 frames):", round(r["p50_s"]*1e3,2), "ms", flush=True)

cond = jnp.zeros((B, 4, 16, 16, 16))
@jax.jit
def policy_sample(mp, cond, key):
    return policy.mar.apply({"params": mp}, cond, key, temperature=0.95, method=Mar.sample_policy)
r = benchmark_fn(policy_sample, params["mar"], cond, jax.random.PRNGKey(2), warmup=2, iters=10)
print("mar enc+dec+100-step sampler (B=32):", round(r["p50_s"]*1e3,2), "ms", flush=True)

# ---- 3. encoder+decoder only (no sampler) ----
@jax.jit
def encdec(mp, cond):
    m = policy.mar.bind({"params": mp})
    import jax.numpy as jnp
    from unified_video_action_tpu.models.mar import patchify
    Bc, T = cond.shape[:2]
    ct = patchify(cond.reshape(Bc*T, *cond.shape[2:]), 1).reshape(Bc, T, 256, 16)
    x = jnp.zeros_like(ct)
    mask = jnp.ones((Bc, T, 256))
    h = m.forward_encoder(x, mask, ct, "policy_model")
    return m.forward_decoder(h)
r = benchmark_fn(encdec, params["mar"], cond, warmup=2, iters=10)
print("mar enc+dec only (B=32):", round(r["p50_s"]*1e3,2), "ms", flush=True)
