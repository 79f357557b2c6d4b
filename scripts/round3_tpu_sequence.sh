#!/bin/bash
# Post-recovery TPU sequence for the round-3 training/bench goals.
# Runs everything that needs the real chip, in dependency order, logging to
# data/outputs/round3_seq/. Safe to re-run: stage 2 resumes from its latest
# checkpoint; eval/bench re-run idempotently.
set -u
cd "$(dirname "$0")/.."
LOG=data/outputs/round3_seq
mkdir -p "$LOG"

echo "[seq] $(date +%H:%M:%S) stage 2 training" | tee -a "$LOG/seq.log"
# Retry loop: a tunnel outage mid-run makes jax block forever, so bound each
# attempt and resume from latest.ckpt (training.resume=true in the config).
# An attempt that dies <60s after a failed predecessor means the chip is
# still gone — wait for it rather than burning attempts.
for attempt in 1 2 3 4; do
    T0=$(date +%s)
    timeout "${STAGE2_TIMEOUT:-14400}" python -u train.py --config-name=uva_pusht_small \
        model.policy.selected_training_mode=policy_model_full_dynamics_model \
        model.policy.action_model_params.predict_action=true \
        model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/pusht_small_stage1/checkpoints/latest \
        training.num_epochs="${STAGE2_EPOCHS:-40}" \
        output_dir=data/outputs/pusht_small_stage2 \
        >> "$LOG/stage2.log" 2>&1
    RC=$?
    echo "[seq] stage2 attempt $attempt exit=$RC after $(( $(date +%s) - T0 ))s" | tee -a "$LOG/seq.log"
    [ "$RC" -eq 0 ] && break
    [ "$attempt" -lt 4 ] && MAX_WAIT=21600 bash scripts/tpu_watch.sh >> "$LOG/seq.log" 2>&1
done

# best checkpoint: prefer topk (named by test_mean_score), else latest
BEST=$(ls -d data/outputs/pusht_small_stage2/checkpoints/epoch=* 2>/dev/null | grep -v -e "\.tmp$" -e "\.old$" | sort -t= -k3 -r | head -1)
BEST=${BEST:-data/outputs/pusht_small_stage2/checkpoints/latest}
echo "[seq] $(date +%H:%M:%S) eval_sim 50-seed on $BEST" | tee -a "$LOG/seq.log"
timeout 10800 python -u eval_sim.py -c "$BEST" -o data/outputs/eval_final \
    task.env_runner.n_test=50 task.env_runner.n_train=6 \
    task.env_runner.n_streams=2 task.env_runner.latent_cache=true \
    task.env_runner.n_test_vis=4 task.env_runner.n_train_vis=2 \
    >> "$LOG/eval50.log" 2>&1
echo "[seq] eval exit=$?" | tee -a "$LOG/seq.log"

echo "[seq] $(date +%H:%M:%S) reduced-step eval (quality delta, 25 steps)" | tee -a "$LOG/seq.log"
timeout 7200 python -u eval_sim.py -c "$BEST" -o data/outputs/eval_25step \
    task.env_runner.n_test=50 task.env_runner.n_train=0 \
    model.policy.autoregressive_model_params.act_diff_testing_steps=25 \
    >> "$LOG/eval25.log" 2>&1
echo "[seq] eval25 exit=$?" | tee -a "$LOG/seq.log"

echo "[seq] $(date +%H:%M:%S) reduced-step eval (quality delta, ddim10)" | tee -a "$LOG/seq.log"
timeout 7200 python -u eval_sim.py -c "$BEST" -o data/outputs/eval_ddim10 \
    task.env_runner.n_test=50 task.env_runner.n_train=0 \
    model.policy.autoregressive_model_params.act_diff_testing_steps=ddim10 \
    >> "$LOG/eval10.log" 2>&1
echo "[seq] eval10 exit=$?" | tee -a "$LOG/seq.log"

echo "[seq] $(date +%H:%M:%S) int8 matmul backend shootout" | tee -a "$LOG/seq.log"
timeout 1200 python -u benchmarks/bench_int8_mm.py >> "$LOG/int8.log" 2>&1
echo "[seq] int8 exit=$?" | tee -a "$LOG/seq.log"

echo "[seq] $(date +%H:%M:%S) rollout stream-depth bench" | tee -a "$LOG/seq.log"
timeout 2400 python -u benchmarks/bench_rollout_streams.py >> "$LOG/streams.log" 2>&1
echo "[seq] streams exit=$?" | tee -a "$LOG/seq.log"

echo "[seq] $(date +%H:%M:%S) two-tier bench.py" | tee -a "$LOG/seq.log"
timeout 3600 python -u bench.py >> "$LOG/bench.log" 2>&1
echo "[seq] bench exit=$?" | tee -a "$LOG/seq.log"
echo "[seq] $(date +%H:%M:%S) DONE" | tee -a "$LOG/seq.log"
