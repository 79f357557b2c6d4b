#!/bin/bash
# CPU rehearsal of scripts/round3_tpu_sequence.sh: every command line from the
# real sequence, shrunk (debug mode / tiny seed counts / tiny bench batch) and
# forced onto the CPU backend, so config typos or code drift cannot waste the
# TPU window when the tunnel recovers. Mirrors the sequence's flags exactly.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=  # the axon plugin silently overrides JAX_PLATFORMS=cpu unless disabled
LOG=data/outputs/rehearsal
mkdir -p "$LOG"
FAIL=0

step() { echo "[rehearse] $(date +%H:%M:%S) $1" | tee -a "$LOG/seq.log"; }
check() { if [ "$1" -ne 0 ]; then echo "[rehearse] FAIL: $2 (exit $1)" | tee -a "$LOG/seq.log"; FAIL=1; else echo "[rehearse] ok: $2" | tee -a "$LOG/seq.log"; fi }

step "stage 2 debug train (2 epochs x 3 steps, rollout+ckpt every epoch)"
timeout 2400 python -u train.py --config-name=uva_pusht_small \
    model.policy.selected_training_mode=policy_model_full_dynamics_model \
    model.policy.action_model_params.predict_action=true \
    model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/pusht_small_stage1/checkpoints/latest \
    training.debug=true \
    output_dir="$LOG/stage2" \
    > "$LOG/stage2.log" 2>&1
check $? "stage2 debug train"

BEST=$(ls -d "$LOG"/stage2/checkpoints/epoch=* 2>/dev/null | grep -v -e "\.tmp$" -e "\.old$" | sort -t= -k3 -r | head -1)
BEST=${BEST:-$LOG/stage2/checkpoints/latest}
step "BEST resolved to: $BEST"
[ -d "$BEST" ] || { echo "[rehearse] FAIL: no checkpoint dir" | tee -a "$LOG/seq.log"; FAIL=1; }

step "eval_sim 2-seed (two-stream latent-cached flags)"
timeout 1200 python -u eval_sim.py -c "$BEST" -o "$LOG/eval_final" \
    task.env_runner.n_test=2 task.env_runner.n_train=1 \
    task.env_runner.n_streams=2 task.env_runner.latent_cache=true \
    task.env_runner.n_test_vis=1 task.env_runner.n_train_vis=0 \
    task.env_runner.max_steps=24 \
    > "$LOG/eval50.log" 2>&1
check $? "eval_sim two-stream"

step "eval_sim reduced-step (act_diff_testing_steps=25)"
timeout 1200 python -u eval_sim.py -c "$BEST" -o "$LOG/eval_25step" \
    task.env_runner.n_test=2 task.env_runner.n_train=0 \
    model.policy.autoregressive_model_params.act_diff_testing_steps=25 \
    task.env_runner.max_steps=24 \
    > "$LOG/eval25.log" 2>&1
check $? "eval_sim 25-step"

step "bench.py smoke (B=2, 2 act steps, both tiers)"
timeout 3000 env UVA_BENCH_BATCH=2 UVA_ACT_STEPS=2 python -u bench.py \
    > "$LOG/bench.log" 2>&1
check $? "bench.py"
tail -1 "$LOG/bench.log" | python -c "import json,sys; d=json.loads(sys.stdin.read()); assert 'value' in d and 'mfu' in d and 'deployed' in d, d" \
    && echo "[rehearse] ok: bench JSON shape" | tee -a "$LOG/seq.log" \
    || { echo "[rehearse] FAIL: bench JSON" | tee -a "$LOG/seq.log"; FAIL=1; }

step "DONE (fail=$FAIL)"
exit $FAIL
