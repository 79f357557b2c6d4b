#!/bin/bash
# mar_base @ 256 px on-hardware TRAINING viability, take 2 (VERDICT r3 item 6).
#
# The round-4 matrix (mar_base_256_viability.json) concluded "oom" for every
# case — but the tracebacks show every failure inside the EPOCH-0 ENV ROLLOUT
# (pusht_runner._run_streams -> device_get), which fired because
# `epoch 0 % rollout_every == 0` no matter how large rollout_every is. The
# epoch tail's blocking `device_get(epoch_losses[-1])` (workspace.py:415)
# SUCCEEDED before each crash, i.e. all 50 reference-size train steps had
# already executed. This rerun measures the pure training envelope with the
# periodic evals disabled (cadence<=0 now means "never") over 2 epochs so
# epoch-1 gives steady-state step time, plus HBM peak from memory_stats.
#
# Reference scale being measured: config/model/uva.yaml:22-49 (mar_base,
# img_size 256, vae_stride 16 -> 1024+64-token context), README.md:214-216
# (reference trains this on 8 GPUs).
set -u
cd "$(dirname "$0")/.."
OUT=${VIABILITY_OUT:-artifacts/round5}
mkdir -p "$OUT"
SUMMARY="$OUT/mar_base_256_viability2.json"

DEMOS=data/pusht_demos_viability.h5
if [ ! -f "$DEMOS" ]; then
    echo "[viability2] generating a small demo set ($DEMOS)"
    python scripts/gen_pusht_demos.py --out "$DEMOS" --episodes 24 \
        --seed0 30000 || exit 1
fi

echo "[" > "$SUMMARY.tmp"
FIRST=1

run_case () {
    local name=$1 gc=$2 bs=$3
    local dir=data/outputs/mar_base_256_v2_$name
    rm -rf "$dir"
    echo "[viability2] case $name (grad_checkpointing=$gc batch=$bs)"
    T0=$(date +%s)
    timeout "${CASE_TIMEOUT:-2400}" python -u train.py --config-name=uva_pusht \
        model.policy.autoregressive_model_params.pretrained_model_path=null \
        model.policy.autoregressive_model_params.grad_checkpointing=$gc \
        model.policy.vae_model_params.autoencoder_path=null \
        model.policy.vae_encode_chunk=32 \
        model.policy.action_model_params.predict_action=true \
        model.policy.selected_training_mode=policy_model_full_dynamics_model \
        task.dataset.dataset_path=$DEMOS \
        training.num_epochs=2 \
        training.max_train_steps=50 \
        training.rollout_every=0 training.sample_every=0 \
        training.val_every=0 training.checkpoint_every=0 \
        training.resume=false \
        dataloader.batch_size=$bs dataloader.num_workers=2 \
        dataloader.device_resident=true \
        output_dir="$dir" \
        > "$OUT/mar_base_256_v2_$name.log" 2>&1
    RC=$?
    WALL=$(( $(date +%s) - T0 ))
    local status=ok
    if [ "$RC" -ne 0 ]; then
        status=fail
        grep -q "RESOURCE_EXHAUSTED" "$OUT/mar_base_256_v2_$name.log" && status=oom
        [ "$RC" -eq 124 ] && status=timeout
    fi
    cp "$dir/logs.jsonl" "$OUT/mar_base_256_v2_${name}_logs.jsonl" 2>/dev/null || true
    [ "$FIRST" = 1 ] || echo "," >> "$SUMMARY.tmp"; FIRST=0
    python3 - "$name" "$gc" "$bs" "$status" "$WALL" \
        "$OUT/mar_base_256_v2_${name}_logs.jsonl" >> "$SUMMARY.tmp" <<'EOF'
import json, sys, os
name, gc, bs, status, wall, logs = sys.argv[1:7]
rec = {"case": name, "grad_checkpointing": gc == "true", "batch": int(bs),
       "steps_per_epoch": 50, "status": status, "wall_s": int(wall)}
if os.path.exists(logs):
    for r in (json.loads(l) for l in open(logs)):
        ep = r.get("epoch")
        if ep in (0, 1):
            rec[f"epoch{ep}_time_s"] = round(r.get("epoch_time", 0), 1)
            if "hbm_peak_bytes" in r:
                rec[f"epoch{ep}_hbm_peak_gb"] = round(
                    r["hbm_peak_bytes"] / 2**30, 2)
    if "epoch1_time_s" in rec:
        rec["steady_step_ms"] = round(rec["epoch1_time_s"] / 50 * 1000, 1)
print(json.dumps(rec))
EOF
    echo "[viability2] case $name -> $status (${WALL}s)"
    tail -1 "$SUMMARY.tmp"
}

run_case gc_off_b16 false 16
run_case gc_on_b16 true 16

echo "]" >> "$SUMMARY.tmp"
mv "$SUMMARY.tmp" "$SUMMARY"
python3 -c "import json;print(json.dumps(json.load(open('$SUMMARY')), indent=1))"
echo "[viability2] done; summary in $SUMMARY"
