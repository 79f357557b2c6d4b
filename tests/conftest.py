"""Test configuration: force an 8-virtual-device CPU platform so sharding and
multi-chip code paths are exercised without TPU hardware (SURVEY.md §4)."""

from unified_video_action_tpu.utils.cpu_platform import force_cpu

# Must run before any jax backend init (the axon sitecustomize pre-imports
# jax, so the helper sets both env vars and jax.config).
force_cpu(8)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

# JAX 0.9 defaults matmul/conv precision low even on CPU; parity tests need
# exact fp32 (production TPU speed comes from bf16 compute dtypes instead).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the suite's dominant cost is re-compiling the
# same jitted programs every run (E2E alone ~6 min cold). Warm reruns of the
# full suite drop to a fraction of that. Safe across processes (file locks).
jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
