#!/bin/bash
# Real-env eval of the CPU-fallback stage-2 policy (TRAINRUN.md): used when
# the TPU tunnel stays down — a real (if CPU-sized) test_mean_score from the
# best checkpoint of data/outputs/stage2_cpu_smoke. Writes into
# data/outputs/eval_final so bench.py's deployed quality gate sees it.
# N_TEST trades confidence for wall-clock (12 seeds ~= 15-25 min on 1 vCPU).
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=

BEST=$(ls -d data/outputs/stage2_cpu_smoke/checkpoints/epoch=* 2>/dev/null | grep -v -e "\.tmp$" -e "\.old$" | sort -t= -k3 -r | head -1)
BEST=${BEST:-data/outputs/stage2_cpu_smoke/checkpoints/latest}
echo "[cpu-eval] $(date +%H:%M:%S) evaluating $BEST"
timeout "${EVAL_TIMEOUT:-7200}" python -u eval_sim.py -c "$BEST" -o data/outputs/eval_final \
    task.env_runner.n_test="${N_TEST:-12}" task.env_runner.n_train=0 \
    task.env_runner.max_steps=300 \
    task.env_runner.n_test_vis=2 task.env_runner.n_train_vis=0 \
    model.policy.autoregressive_model_params.act_diff_testing_steps="${ACT_STEPS:-25}"
echo "[cpu-eval] exit=$?"
ls data/outputs/eval_final/eval_log_*.json 2>/dev/null | tail -1 | xargs -r cat | head -c 400
