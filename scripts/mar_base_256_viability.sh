#!/bin/bash
# mar_base @ 256 px on-hardware training viability check (VERDICT r3 item 6):
# run the REFERENCE-SIZE config (config/model/uva.yaml scale: mar_base,
# img_size 256, 1088-token context, B=16 — reference README.md:214-216 trains
# this on 8 GPUs) through train.py on the single real TPU chip for >=50 steps,
# with grad checkpointing off and on, recording compile time (epoch 0 incl.
# jit), steady-state step time (epoch 1), and HBM use (workspace logs
# hbm_peak_bytes per epoch). Quality is out of scope — random-init weights,
# the measurement is compile + memory + throughput at reference scale.
set -eu
cd "$(dirname "$0")/.."
OUT=artifacts/round4
mkdir -p "$OUT"

run_case () {
    local name=$1 gc=$2
    local dir=data/outputs/mar_base_256_viability_$name
    rm -rf "$dir"
    echo "[viability] case $name (grad_checkpointing=$gc)"
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
        dataloader.batch_size=16 dataloader.num_workers=2 \
        dataloader.device_resident=true \
        output_dir="$dir" \
        > "$OUT/mar_base_256_$name.log" 2>&1
    cp "$dir/logs.jsonl" "$OUT/mar_base_256_${name}_logs.jsonl"
    tail -2 "$OUT/mar_base_256_${name}_logs.jsonl"
}

run_case gc_off false
run_case gc_on true
echo "[viability] done; logs in $OUT/mar_base_256_*"
