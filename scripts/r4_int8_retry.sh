#!/bin/bash
# One-shot: fresh digest-stamped int8 W8A8 eval on the committed flagship
# export, at the act_steps bench will actually serve (pass as $1: "ddim10"
# or "100" — ADVICE r3: int8 evidence must match the served step count).
set -u
STEPS=${1:?pass act_steps (ddim10 or 100)}
cd "$(dirname "$0")/.."
EXPORT=pretrained_models/uva_pusht_small
rm -rf data/outputs/eval_int8
timeout -k 120 1500 python -u eval_sim.py -c "$EXPORT/latest" -o data/outputs/eval_int8 \
    task.env_runner.n_test=50 task.env_runner.n_train=0 \
    task.env_runner.n_streams=2 task.env_runner.latent_cache=true \
    task.env_runner.n_test_vis=0 task.env_runner.n_train_vis=0 \
    model.policy.autoregressive_model_params.act_diff_testing_steps="$STEPS" \
    model.policy.serving_quant=int8 \
    > data/outputs/eval_int8_run.log 2>&1
echo "exit=$?" >> data/outputs/eval_int8_run.log
mkdir -p "$EXPORT/eval_int8"
cp data/outputs/eval_int8/eval_log_*.json "$EXPORT/eval_int8/" 2>/dev/null
git add -A "$EXPORT/eval_int8"
git commit -m "Round-4 eval evidence: fresh digest-stamped int8 (act_steps=$STEPS) on the flagship export" || true
