#!/bin/bash
# Full round-3 recovery chain after an environment reset wiped data/:
# wait for demo generation -> stage-1 video pretrain -> round3_tpu_sequence.sh
# (stage-2 train, 50-seed eval, reduced-step deltas, benches).
# Assumes scripts/gen_pusht_demos.py is already running with its pid in
# /tmp/gendemos.pid (or demos already exist).
set -u
cd "$(dirname "$0")/.."
LOG=data/outputs/round3_seq
mkdir -p "$LOG"

if [ -f /tmp/gendemos.pid ] && kill -0 "$(cat /tmp/gendemos.pid)" 2>/dev/null; then
    echo "[rec] $(date +%H:%M:%S) waiting for demo generation (pid $(cat /tmp/gendemos.pid))" | tee -a "$LOG/seq.log"
    tail --pid="$(cat /tmp/gendemos.pid)" -f /dev/null
fi
if [ ! -f data/pusht_demos.h5 ]; then
    echo "[rec] demo file missing after generation; aborting" | tee -a "$LOG/seq.log"
    exit 1
fi
echo "[rec] $(date +%H:%M:%S) demos ready: $(ls -la data/pusht_demos.h5 | awk '{print $5}') bytes" | tee -a "$LOG/seq.log"

# Stage 1: video-only pretrain (skip if a checkpoint already exists)
if [ ! -d data/outputs/pusht_small_stage1/checkpoints/latest ]; then
    echo "[rec] $(date +%H:%M:%S) stage 1 training" | tee -a "$LOG/seq.log"
    for attempt in 1 2 3; do
        T0=$(date +%s)
        timeout "${STAGE1_TIMEOUT:-7200}" python -u train.py --config-name=uva_pusht_small \
            model.policy.selected_training_mode=video_model \
            model.policy.action_model_params.predict_action=false \
            training.num_epochs="${STAGE1_EPOCHS:-6}" \
            training.rollout_every=1000 \
            output_dir=data/outputs/pusht_small_stage1 \
            >> "$LOG/stage1.log" 2>&1
        RC=$?
        echo "[rec] stage1 attempt $attempt exit=$RC after $(( $(date +%s) - T0 ))s" | tee -a "$LOG/seq.log"
        [ "$RC" -eq 0 ] && break
        [ "$attempt" -lt 3 ] && MAX_WAIT=21600 bash scripts/tpu_watch.sh >> "$LOG/seq.log" 2>&1
    done
fi

echo "[rec] $(date +%H:%M:%S) handing off to round3_tpu_sequence.sh" | tee -a "$LOG/seq.log"
exec bash scripts/round3_tpu_sequence.sh
