#!/bin/bash
# Round-5 kitchen-suite run (VERDICT r4 next-round #4): train the language-
# conditioned multi-task policy on the 3-task scripted-expert corpus, then
# run the per-task LiberoImageRunner protocol and commit the eval json.
# Usage: bash scripts/round5_kitchen.sh  (env: KTRAIN_TIMEOUT, KEVAL_TIMEOUT,
#        KEPOCHS, KEVAL_SEEDS)
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/round5
RUN=data/outputs/uva_kitchen_small
mkdir -p "$OUT"
note() { echo "[kitchen5] $(date +%H:%M:%S) $*"; }

note "training (resume=true picks up any prior checkpoint)"
for attempt in 1 2; do
    timeout -k 120 "${KTRAIN_TIMEOUT:-4500}" python -u train.py \
        --config-name=uva_kitchen_small \
        training.num_epochs="${KEPOCHS:-20}" \
        output_dir="$RUN" >> "$OUT/kitchen_train.log" 2>&1
    RC=$?
    note "train attempt $attempt exit=$RC"
    [ "$RC" -eq 0 ] || [ "$RC" -eq 124 ] && break
    MAX_WAIT=1800 bash scripts/tpu_watch.sh || break
done
cp "$RUN/logs.jsonl" "$OUT/kitchen_train_logs.jsonl" 2>/dev/null
git add -A "$OUT" && git commit -q -m "Kitchen-suite training logs" 2>/dev/null

BEST=$(ls -d "$RUN/checkpoints/epoch="* 2>/dev/null \
    | grep -v -e "\.tmp$" -e "\.old$" \
    | awk -F'test_mean_score=' 'NF==2 && $2+0 > 0 {print $2 "\t" $0}' \
    | sort -g -r | head -1 | cut -f2)
# all-zero topk scores carry no ranking signal: evaluate the final weights
BEST=${BEST:-$RUN/checkpoints/latest}
note "eval checkpoint: $BEST"

note "per-task protocol (${KEVAL_SEEDS:-10} seeds/task)"
rm -rf data/outputs/kitchen_eval
timeout -k 120 "${KEVAL_TIMEOUT:-2400}" python -u eval_sim.py -c "$BEST" \
    -o data/outputs/kitchen_eval \
    task.env_runner.n_test="${KEVAL_SEEDS:-10}" task.env_runner.n_train=0 \
    task.env_runner.n_test_vis=2 task.env_runner.n_train_vis=0 \
    >> "$OUT/kitchen_eval.log" 2>&1
note "eval exit=$?"
mkdir -p pretrained_models/uva_kitchen_small
cp data/outputs/kitchen_eval/eval_log_*.json pretrained_models/uva_kitchen_small/ 2>/dev/null
git add -A "$OUT" pretrained_models/uva_kitchen_small
git commit -q -m "Kitchen-suite per-task eval evidence" 2>/dev/null
note "DONE"
