#!/bin/bash
# Round-5 flagship training (VERDICT r4 next-round #3): train stage 1 to
# CONVERGENCE (video_fvd_vae plateau via the new metric early stop), then
# sweep stage-2 LR {3e-5, 1e-5} against the epoch-0-peak pathology (both
# round-3 and round-4 stage-2 runs peaked at epoch 0 on a converged stage-1
# init at lr=1e-4, then decayed monotonically), then continue the winning
# probe to its own early-stop.
#
# Stage 1 bootstraps from the committed round-4 flagship export (mar_base
# width @ 96 px, stage-2-epoch-0 weights) rather than from scratch: the same
# recipe's video weights after 8 stage-1 epochs + 1 joint epoch — committed
# at pretrained_models/uva_pusht_small/latest.
#
# Usage: bash scripts/round5_train.sh  (env: STAGE1_EPOCHS, PROBE_EPOCHS,
#        FINAL_EPOCHS, DEMOS, per-leg *_TIMEOUT)
set -u
cd "$(dirname "$0")/.."
LOG=data/outputs/round5_seq
EXPORT=pretrained_models/uva_pusht_small
DEMOS=${DEMOS:-data/pusht_demos_s1.h5}
mkdir -p "$LOG" artifacts/round5
note() { echo "[seq5] $(date +%H:%M:%S) $*" | tee -a "$LOG/seq.log"; }

# ---- data snapshot --------------------------------------------------------
# the generator publishes data/pusht_demos.h5 atomically every 25 episodes;
# snapshot it so a mid-epoch publish never swaps the file under the loader
if [ ! -f "$DEMOS" ] || [ "${RESNAPSHOT:-0}" = "1" ]; then
    cp data/pusht_demos.h5 "$DEMOS"
fi
note "stage-1 demos: $(python -c "
from unified_video_action_tpu.data.replay_buffer import ReplayBuffer
b = ReplayBuffer.load('$DEMOS'); print(b.n_episodes, 'episodes', b.n_steps, 'steps')")"

train_leg () {
    local name=$1 tmo=$2; shift 2
    for attempt in 1 2 3; do
        T0=$(date +%s)
        timeout "$tmo" python -u train.py --config-name=uva_pusht_small "$@" \
            >> "$LOG/$name.log" 2>&1
        RC=$?
        note "$name attempt $attempt exit=$RC after $(( $(date +%s) - T0 ))s"
        [ "$RC" -eq 0 ] && return 0
        [ "$RC" -eq 124 ] && return 124   # leg budget exhausted, move on
        [ "$attempt" -lt 3 ] && MAX_WAIT=3600 bash scripts/tpu_watch.sh >> "$LOG/seq.log" 2>&1
    done
    return 1
}

# ---- stage 1: video-only to convergence -----------------------------------
if [ ! -d data/outputs/pusht5_stage1/checkpoints/latest ] || [ "${FORCE_S1:-0}" = 1 ]; then
    note "stage 1 (mar_base width @ 96 px, fvd-plateau early stop)"
    train_leg stage1 "${STAGE1_TIMEOUT:-9000}" \
        model.policy.selected_training_mode=video_model \
        model.policy.action_model_params.predict_action=false \
        model.policy.autoregressive_model_params.model_size=mar_base \
        model.policy.autoregressive_model_params.pretrained_model_path="$EXPORT/latest" \
        task.dataset.dataset_path="$DEMOS" \
        training.num_epochs="${STAGE1_EPOCHS:-24}" \
        training.rollout_every=0 \
        training.sample_every=1 \
        training.val_every=0 \
        training.early_stop_patience=3 \
        training.checkpoint_every=2 \
        output_dir=data/outputs/pusht5_stage1
fi
[ -d data/outputs/pusht5_stage1/checkpoints/latest ] || { note "no stage-1 ckpt; abort"; exit 1; }

# refresh demos for stage 2 with everything generated meanwhile
if [ "${REFRESH_S2_DEMOS:-1}" = 1 ]; then
    cp data/pusht_demos.h5 data/pusht_demos_s2.h5
    S2DEMOS=data/pusht_demos_s2.h5
else
    S2DEMOS=$DEMOS
fi
note "stage-2 demos: $(python -c "
from unified_video_action_tpu.data.replay_buffer import ReplayBuffer
b = ReplayBuffer.load('$S2DEMOS'); print(b.n_episodes, 'episodes')")"

# stop the demo generator before stage 2 (1 vCPU: rollout evals need it)
if [ -f /tmp/gen_demos.pid ] && kill -0 "$(cat /tmp/gen_demos.pid)" 2>/dev/null; then
    kill "$(cat /tmp/gen_demos.pid)" 2>/dev/null
    note "demo generator stopped for stage 2"
fi

# ---- stage 2: LR probes ----------------------------------------------------
# Every stage-2 run uses the SAME num_epochs (so the cosine schedule is
# identical between probe and continuation — a probe with its own short
# epoch count would decay its LR to zero and measure a different recipe);
# probes are bounded by wall time instead: `timeout` SIGTERMs the trainer,
# the preemption path saves a clean resumable checkpoint, and the winner
# continues IN its own output dir via training.resume=true.
stage2_run () {
    local name=$1 lr=$2 tmo=$3
    train_leg "$name" "$tmo" \
        model.policy.selected_training_mode=policy_model_full_dynamics_model \
        model.policy.action_model_params.predict_action=true \
        model.policy.autoregressive_model_params.model_size=mar_base \
        model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/pusht5_stage1/checkpoints/latest \
        model.policy.optimizer.learning_rate="$lr" \
        task.dataset.dataset_path="$S2DEMOS" \
        training.num_epochs="${FINAL_EPOCHS:-40}" \
        training.rollout_every=2 \
        training.sample_every=0 \
        training.val_every=4 \
        training.early_stop_patience=4 \
        training.checkpoint_every=4 \
        checkpoint.topk.k=2 \
        output_dir="data/outputs/$name"
}

best_score () {  # best topk score recorded in a run dir's checkpoints
    ls -d "data/outputs/$1/checkpoints/epoch="* 2>/dev/null \
        | grep -v -e "\.tmp$" -e "\.old$" \
        | awk -F'test_mean_score=' 'NF==2 {print $2}' | sort -g -r | head -1
}

if [ "${SKIP_PROBES:-0}" != 1 ]; then
    note "stage-2 probe lr=3e-5"
    stage2_run pusht5_s2_lr3e5 3e-5 "${PROBE_TIMEOUT:-3300}"
    note "probe 3e-5 best: $(best_score pusht5_s2_lr3e5)"
    note "stage-2 probe lr=1e-5"
    stage2_run pusht5_s2_lr1e5 1e-5 "${PROBE_TIMEOUT:-3300}"
    note "probe 1e-5 best: $(best_score pusht5_s2_lr1e5)"
fi

B3=$(best_score pusht5_s2_lr3e5); B3=${B3:-0}
B1=$(best_score pusht5_s2_lr1e5); B1=${B1:-0}
if python -c "exit(0 if float('$B3') >= float('$B1') else 1)"; then
    WIN=pusht5_s2_lr3e5; WINLR=3e-5
else
    WIN=pusht5_s2_lr1e5; WINLR=1e-5
fi
note "winner: $WIN (3e-5: $B3 vs 1e-5: $B1) — continuing to early stop"

# continuation resumes IN the winner's output dir (training.resume=true)
stage2_run "$WIN" "$WINLR" "${FINAL_TIMEOUT:-7200}"

cp data/outputs/pusht5_stage1/logs.jsonl artifacts/round5/stage1_logs.jsonl 2>/dev/null
cp "data/outputs/$WIN/logs.jsonl" artifacts/round5/stage2_winner_logs.jsonl 2>/dev/null
cp data/outputs/pusht5_s2_lr3e5/logs.jsonl artifacts/round5/stage2_lr3e5_logs.jsonl 2>/dev/null
cp data/outputs/pusht5_s2_lr1e5/logs.jsonl artifacts/round5/stage2_lr1e5_logs.jsonl 2>/dev/null
echo "$WIN" > artifacts/round5/stage2_winner.txt
note "DONE (winner $WIN, best $(best_score "$WIN"))"
