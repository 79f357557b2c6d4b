#!/bin/bash
# mar_base @ 256 px on-hardware training viability check (VERDICT r3 item 6):
# run the REFERENCE-SIZE config (config/model/uva.yaml scale: mar_base,
# img_size 256, 1088-token context — reference README.md:214-216 trains this
# on 8 GPUs) through train.py on the single real TPU chip for >=50 steps,
# across (grad_checkpointing, batch) cases, recording per-case outcome:
# compile+epoch-0 time, steady-state epoch-1 time, and HBM peak (workspace
# logs hbm_peak_bytes per epoch). An OOM is a recorded result, not a script
# failure — the point is to MEASURE the envelope, e.g. "B=16 needs remat".
# Quality is out of scope — random-init weights; the measurement is compile
# + memory + throughput at reference scale.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/round4
mkdir -p "$OUT"
SUMMARY="$OUT/mar_base_256_viability.json"
echo "[" > "$SUMMARY.tmp"
FIRST=1

run_case () {
    local name=$1 gc=$2 bs=$3
    local dir=data/outputs/mar_base_256_viability_$name
    rm -rf "$dir"
    echo "[viability] case $name (grad_checkpointing=$gc batch=$bs)"
    T0=$(date +%s)
    timeout 3600 python -u train.py --config-name=uva_pusht \
        model.policy.autoregressive_model_params.pretrained_model_path=null \
        model.policy.autoregressive_model_params.grad_checkpointing=$gc \
        model.policy.vae_model_params.autoencoder_path=null \
        model.policy.action_model_params.predict_action=true \
        model.policy.selected_training_mode=policy_model_full_dynamics_model \
        task.dataset.dataset_path=data/pusht_demos.h5 \
        training.num_epochs=2 \
        training.max_train_steps=50 \
        training.rollout_every=1000 training.sample_every=1000 \
        training.val_every=1000 training.checkpoint_every=1000 \
        training.resume=false \
        dataloader.batch_size=$bs dataloader.num_workers=2 \
        dataloader.device_resident=true \
        output_dir="$dir" \
        > "$OUT/mar_base_256_$name.log" 2>&1
    RC=$?
    WALL=$(( $(date +%s) - T0 ))
    local status=ok
    if [ "$RC" -ne 0 ]; then
        status=fail
        grep -q "RESOURCE_EXHAUSTED" "$OUT/mar_base_256_$name.log" && status=oom
    fi
    cp "$dir/logs.jsonl" "$OUT/mar_base_256_${name}_logs.jsonl" 2>/dev/null || true
    [ "$FIRST" = 1 ] || echo "," >> "$SUMMARY.tmp"; FIRST=0
    python3 - "$name" "$gc" "$bs" "$status" "$WALL" "$OUT/mar_base_256_${name}_logs.jsonl" >> "$SUMMARY.tmp" <<'EOF'
import json, sys, os
name, gc, bs, status, wall, logs = sys.argv[1:7]
rec = {"case": name, "grad_checkpointing": gc == "true", "batch": int(bs),
       "status": status, "wall_s": int(wall)}
if os.path.exists(logs):
    rows = [json.loads(l) for l in open(logs)]
    for r in rows:
        ep = r.get("epoch")
        if ep in (0, 1):
            rec[f"epoch{ep}_time_s"] = round(r.get("epoch_time", 0), 1)
            if "hbm_peak_bytes" in r:
                rec[f"epoch{ep}_hbm_peak_gb"] = round(r["hbm_peak_bytes"] / 2**30, 2)
    if "epoch1_time_s" in rec:
        rec["steady_step_ms"] = round(rec["epoch1_time_s"] / 50 * 1000, 1)
print(json.dumps(rec))
EOF
    echo "[viability] case $name -> $status (${WALL}s)"
}

run_case gc_off_b16 false 16
run_case gc_on_b16 true 16
# if the unremat'd case OOMs, find a batch that fits without remat
if grep -q '"case": "gc_off_b16", .*"status": "oom"' "$SUMMARY.tmp" || \
   grep -q '"status": "oom"' <(grep gc_off_b16 "$SUMMARY.tmp"); then
    run_case gc_off_b8 false 8
fi
echo "]" >> "$SUMMARY.tmp"
mv "$SUMMARY.tmp" "$SUMMARY"
python3 -c "import json;print(json.dumps(json.load(open('$SUMMARY')), indent=1))"
echo "[viability] done; summary in $SUMMARY"
