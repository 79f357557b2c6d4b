#!/bin/bash
# Poll the remote service with a FRESH-shape compile (jax.devices() alone
# does not detect a wedged compiler). Writes /tmp/tpu_healthy with the probe
# latency when a new-program compile completes in under PROBE_TIMEOUT.
PROBE_TIMEOUT=${PROBE_TIMEOUT:-240}
SLEEP=${SLEEP:-180}
rm -f /tmp/tpu_healthy
i=$((RANDOM % 50))
while true; do
    i=$((i + 1))
    T0=$(date +%s)
    if timeout "$PROBE_TIMEOUT" python -u -c "
import time, jax, jax.numpy as jnp
n = 257 + $i          # fresh shape each round -> no executable-cache hit
a = jnp.ones((n, n + 2)); b = jnp.ones((n + 2, n - 3))
t = time.time(); v = float((a @ b).sum())
print('compile_ok', round(time.time() - t, 1))" > /tmp/tpu_probe_last 2>&1; then
        DT=$(( $(date +%s) - T0 ))
        echo "$(date +%H:%M:%S) healthy (${DT}s)" | tee /tmp/tpu_healthy
        exit 0
    fi
    echo "$(date +%H:%M:%S) compile probe failed/slow (> ${PROBE_TIMEOUT}s)"
    sleep "$SLEEP"
done
