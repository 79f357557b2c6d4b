#!/bin/bash
# One-shot: fresh digest-stamped ddim10 eval on the committed flagship
# export, self-committing (evidence durability — VERDICT r3 weak #1).
set -u
cd "$(dirname "$0")/.."
EXPORT=pretrained_models/uva_pusht_small
rm -rf data/outputs/eval_ddim10
timeout -k 120 1500 python -u eval_sim.py -c "$EXPORT/latest" -o data/outputs/eval_ddim10 \
    task.env_runner.n_test=50 task.env_runner.n_train=0 \
    task.env_runner.n_streams=2 task.env_runner.latent_cache=true \
    task.env_runner.n_test_vis=0 task.env_runner.n_train_vis=0 \
    model.policy.autoregressive_model_params.act_diff_testing_steps=ddim10 \
    > data/outputs/eval_ddim10_run.log 2>&1
echo "exit=$?" >> data/outputs/eval_ddim10_run.log
mkdir -p "$EXPORT/eval_ddim10"
cp data/outputs/eval_ddim10/eval_log_*.json "$EXPORT/eval_ddim10/" 2>/dev/null
git add -A "$EXPORT/eval_ddim10"
git commit -m "Round-4 eval evidence: fresh digest-stamped ddim10 on the flagship export" || true
