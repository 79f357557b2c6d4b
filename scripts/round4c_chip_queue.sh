#!/bin/bash
# Round-4 follow-up chip work, run AFTER round4b_train.sh releases the chip:
#   1. UMI multi-dataset training drive (VERDICT r3 item 4) — zarr paths fixed
#   2. mar_base@256 viability, gc_on at smaller batches (find what FITS after
#      the B=16 OOMs; VERDICT r3 item 6 wants a measured yes/no per config)
#   3. deployed-tier serving-shape sweep (median-window 5x target)
#   4. the fetch-task debug e2e (CPU) that was parked to keep the host free
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/round4
mkdir -p "$OUT"
note() { echo "[q4c] $(date +%H:%M:%S) $*" | tee -a "$OUT/round4c_queue.log"; }

note "1/4 UMI multi-dataset chip drive"
UMI_TIMEOUT=${UMI_TIMEOUT:-2400} bash scripts/run_umi_multi_chip.sh \
    >> "$OUT/round4c_queue.log" 2>&1 || note "UMI drive exited nonzero"

# smaller-batch gc_on viability cases: reuse the rerun script shape
for B in 8 4; do
    note "2/4 mar_base@256 gc_on b$B"
    name=gc_on_b${B}_tied_dropout
    dir=data/outputs/mar_base_256_viability_$name
    rm -rf "$dir"
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
        dataloader.batch_size=$B dataloader.num_workers=2 \
        dataloader.device_resident=true \
        output_dir="$dir" \
        > "$OUT/mar_base_256_$name.log" 2>&1
    RC=$?
    WALL=$(( $(date +%s) - T0 ))
    status=ok
    if [ "$RC" -ne 0 ]; then
        status=fail
        grep -qiE "RESOURCE_EXHAUSTED|Ran out of memory" \
            "$OUT/mar_base_256_$name.log" && status=oom
    fi
    cp "$dir/logs.jsonl" "$OUT/mar_base_256_${name}_logs.jsonl" 2>/dev/null || true
    python - "$name" "$status" "$RC" "$WALL" <<'EOF'
import json, sys
name, status, rc, wall = sys.argv[1:5]
path = "artifacts/round4/mar_base_256_viability.json"
try:
    doc = json.load(open(path))
except Exception:
    doc = {"cases": []}
doc["cases"] = [c for c in doc["cases"] if c.get("name") != name]
doc["cases"].append({"name": name, "status": status, "exit": int(rc),
                     "wall_s": int(wall)})
json.dump(doc, open(path, "w"), indent=1)
print(doc["cases"][-1])
EOF
    note "case $name -> $status (${WALL}s)"
    # once a batch fits, the smaller one is moot
    [ "$status" = ok ] && break
done

note "3/4 deployed-tier serving-shape sweep"
bash scripts/deployed_tier_sweep.sh >> "$OUT/round4c_queue.log" 2>&1 \
    || note "sweep exited nonzero"

note "4/4 fetch-task debug e2e on CPU"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 1500 nice -n 10 \
    python -u train.py --config-name=uva_fetch training.debug=true \
    training.rollout_every=1 task.env_runner.n_test=1 \
    task.env_runner.n_train=1 task.env_runner.max_steps=16 \
    dataloader.device_resident=false \
    model.policy.vae_model_params.autoencoder_path=null \
    output_dir=data/outputs/fetch_debug \
    > "$OUT/fetch_debug_train.log" 2>&1
note "fetch debug exit=$? (log: $OUT/fetch_debug_train.log)"
tail -3 "$OUT/fetch_debug_train.log" | tee -a "$OUT/round4c_queue.log"
note "QUEUE DONE"
