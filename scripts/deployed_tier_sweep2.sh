#!/bin/bash
# Focused deployed-tier serving-shape sweep (round-4 continuation): the
# rehearsal showed the gates engage (ddim10+int8, digest-tied) but the
# MEDIAN window landed at 1.8x — individual ~5 s windows through the shared
# axon tunnel swing 160-490 chunks/s for the identical program. Levers:
# batch (fewer round trips per chunk), stream depth (more in flight), and
# UVA_BENCH_REPEATS stays 5 while the windows themselves lengthen via batch.
# Random weights; throughput only (quality gating is bench.py's job).
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/round4
mkdir -p "$OUT"
JSONL="$OUT/deployed_sweep2.jsonl"
: > "$JSONL"
for cfg in "256 8" "512 8"; do
    set -- $cfg
    B=$1; S=$2
    echo "[sweep2] batch=$B streams=$S $(date +%H:%M:%S)"
    UVA_BENCH_TIER=deployed UVA_ACT_STEPS=ddim10 UVA_SERVING_QUANT=int8 \
    UVA_BENCH_BATCH=$B UVA_BENCH_STREAMS=$S timeout 1500 python -u bench.py \
        > /tmp/sweep_line.json 2> /tmp/sweep_err.log || {
            echo "{\"batch\": $B, \"streams\": $S, \"error\": true}" >> "$JSONL"
            tail -3 /tmp/sweep_err.log; continue; }
    python3 - "$B" "$S" >> "$JSONL" <<'EOF'
import json, sys
line = [l for l in open("/tmp/sweep_line.json") if l.strip().startswith("{")][-1]
j = json.loads(line)
d = j.get("deployed", j)
out = {"batch": int(sys.argv[1]), "streams": int(sys.argv[2]),
       "chunks_per_sec": d["chunks_per_sec"],
       "windows": d["throughput_windows"], "best": d.get("best_window"),
       "p50_ms": d["p50_step_latency_ms"]}
print(json.dumps(out))
EOF
    tail -1 "$JSONL"
done
echo "[sweep2] done"
