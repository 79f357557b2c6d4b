"""Force the CPU platform with virtual devices (shared helper).

This environment's sitecustomize pre-imports jax and registers the axon TPU
plugin, so env vars alone can be too late; ``jax.config`` updates still work
until the first backend init. One implementation for the three callers that
previously each carried the dance (__graft_entry__, tests/conftest.py,
tests/multihost_worker.py) — any future change to the axon workaround lands
in exactly one place.
"""

from __future__ import annotations

import os


def force_cpu(n_devices: int = 8) -> None:
    """Disable the axon plugin and select cpu with ``n_devices`` virtual
    devices — via env (for late imports / subprocesses) AND jax.config (for a
    process where jax is already imported). Call before any backend init."""
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(n_devices, 1))
    except RuntimeError:
        # backend already initialized; the caller must live with (or assert
        # on) whatever platform is active
        pass
