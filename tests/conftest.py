"""Test configuration: force an 8-virtual-device CPU platform so sharding and
multi-chip code paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere. The environment pre-registers
# the axon TPU plugin (sitecustomize + JAX_PLATFORMS=axon); clearing
# PALLAS_AXON_POOL_IPS disables that registration so cpu actually wins.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup (before this
# conftest), so the env vars above can be too late; force the platform list
# through jax.config as well (effective until the first backend init).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# JAX 0.9 defaults matmul/conv precision low even on CPU; parity tests need
# exact fp32 (production TPU speed comes from bf16 compute dtypes instead).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the suite's dominant cost is re-compiling the
# same jitted programs every run (E2E alone ~6 min cold). Warm reruns of the
# full suite drop to a fraction of that. Safe across processes (file locks).
jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
