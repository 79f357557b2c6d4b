#!/bin/bash
# Deployed-tier serving-shape sweep (VERDICT r3: clear 5x on the MEDIAN
# window). The deployed tier is dispatch-round-trip bound through the axon
# tunnel (MFU ~0.1): the levers are batch size (fewer dispatches per chunk)
# and stream interleave depth (more dispatches in flight). This measures the
# median-window chunks/s across (batch, streams) at the ddim10 serving point
# with random weights (throughput only; quality gating is bench.py's job).
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/round4
mkdir -p "$OUT"
: > "$OUT/deployed_sweep.jsonl"
for cfg in "128 4" "256 4" "256 8" "512 4" "128 8"; do
    set -- $cfg
    B=$1; S=$2
    echo "[sweep] batch=$B streams=$S"
    UVA_BENCH_TIER=deployed UVA_ACT_STEPS=ddim10 UVA_BENCH_BATCH=$B \
    UVA_BENCH_STREAMS=$S timeout 1800 python -u bench.py \
        > /tmp/sweep_line.json 2> /tmp/sweep_err.log || {
            echo "{\"batch\": $B, \"streams\": $S, \"error\": true}" >> "$OUT/deployed_sweep.jsonl"
            tail -3 /tmp/sweep_err.log; continue; }
    python3 - "$B" "$S" >> "$OUT/deployed_sweep.jsonl" <<'EOF'
import json, sys
line = [l for l in open("/tmp/sweep_line.json") if l.strip().startswith("{")][-1]
d = json.loads(line)["deployed"] if "deployed" in json.loads(line) else json.loads(line)
out = {"batch": int(sys.argv[1]), "streams": int(sys.argv[2]),
       "chunks_per_sec": d["chunks_per_sec"],
       "windows": d["throughput_windows"], "best": d.get("best_window"),
       "p50_ms": d["p50_step_latency_ms"]}
print(json.dumps(out))
EOF
    tail -1 "$OUT/deployed_sweep.jsonl"
done
echo "[sweep] done"
