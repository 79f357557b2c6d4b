#!/bin/bash
# Re-run the gc_on_b16 viability case after the tied-dropout fix
# (models/transformer.py tied_dropout): the original attempt failed at
# compile with 25.56G/15.75G HBM because XLA hoisted every block's
# (16,12,1024,1024) u32 dropout-mask bits to program start. Appends the
# post-fix case to artifacts/round4/mar_base_256_viability.json.
set -u
export STEPS=${STEPS:-20}
cd "$(dirname "$0")/.."
OUT=artifacts/round4
SUMMARY="$OUT/mar_base_256_viability.json"
name=gc_on_b16_tied_dropout
dir=data/outputs/mar_base_256_viability_$name
rm -rf "$dir"
echo "[viability] case $name (grad_checkpointing=true batch=16, tied dropout)"
T0=$(date +%s)
timeout ${CASE_TIMEOUT:-1800} python -u train.py --config-name=uva_pusht \
    model.policy.autoregressive_model_params.pretrained_model_path=null \
    model.policy.autoregressive_model_params.grad_checkpointing=true \
    model.policy.vae_model_params.autoencoder_path=null \
    model.policy.action_model_params.predict_action=true \
    model.policy.selected_training_mode=policy_model_full_dynamics_model \
    task.dataset.dataset_path=data/pusht_demos.h5 \
    training.num_epochs=2 \
    training.max_train_steps=${STEPS:-20} \
    training.rollout_every=1000 training.sample_every=1000 \
    training.val_every=1000 training.checkpoint_every=1000 \
    training.resume=false \
    dataloader.batch_size=16 dataloader.num_workers=2 \
    dataloader.device_resident=true \
    output_dir="$dir" \
    > "$OUT/mar_base_256_$name.log" 2>&1
RC=$?
WALL=$(( $(date +%s) - T0 ))
status=ok
if [ "$RC" -ne 0 ]; then
    status=fail
    grep -qiE "RESOURCE_EXHAUSTED|Ran out of memory" "$OUT/mar_base_256_$name.log" && status=oom
fi
cp "$dir/logs.jsonl" "$OUT/mar_base_256_${name}_logs.jsonl" 2>/dev/null || true
python3 - "$name" "$status" "$WALL" "$OUT/mar_base_256_${name}_logs.jsonl" "$SUMMARY" <<'EOF'
import json, sys, os
name, status, wall, logs, summary = sys.argv[1:6]
rec = {"case": name, "grad_checkpointing": True, "batch": 16,
       "tied_dropout": True, "steps": int(os.environ.get("STEPS","20")), "status": status, "wall_s": int(wall)}
if os.path.exists(logs):
    for r in (json.loads(l) for l in open(logs)):
        ep = r.get("epoch")
        if ep in (0, 1):
            rec[f"epoch{int(ep)}_time_s"] = round(r.get("epoch_time", 0), 1)
            if "hbm_peak_bytes" in r:
                rec[f"epoch{int(ep)}_hbm_peak_gb"] = round(r["hbm_peak_bytes"] / 2**30, 2)
    if "epoch1_time_s" in rec:
        rec["steady_step_ms"] = round(rec["epoch1_time_s"] / float(os.environ.get("STEPS", "20")) * 1000, 1)
cases = json.load(open(summary)) if os.path.exists(summary) else []
cases = [c for c in cases if c.get("case") != name] + [rec]
json.dump(cases, open(summary, "w"), indent=1)
print(json.dumps(rec))
EOF
echo "[viability] case $name -> $status (${WALL}s)"
