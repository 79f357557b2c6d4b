#!/bin/bash
# Poll the TPU tunnel until jax sees a TPU device, then exit 0.
# Exits 1 after MAX_WAIT seconds (default 11h) without recovery.
MAX_WAIT=${MAX_WAIT:-39600}
START=$(date +%s)
while true; do
    if timeout 120 env JAX_PLATFORMS=tpu python -c "import jax; assert jax.devices()[0].platform=='tpu'" 2>/dev/null; then
        echo "[tpu_watch] TPU back at $(date +%H:%M:%S)"
        exit 0
    fi
    NOW=$(date +%s)
    if [ $((NOW - START)) -gt "$MAX_WAIT" ]; then
        echo "[tpu_watch] gave up after ${MAX_WAIT}s"
        exit 1
    fi
    sleep 120
done
