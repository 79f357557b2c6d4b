#!/bin/bash
# Round-5 end-of-round tail: export the best stage-2 checkpoint IF it beats
# the committed round-4 flagship on the full 50-seed protocol, and record the
# digest-stamped eval evidence for every serving gate bench.py can engage
# (full-step, ddim10, ddim10+int8, ddim10+int8+yuv420). Commits after EVERY
# leg (the round-3 lesson) and is deadline-aware (DEADLINE_EPOCH env).
#
# If the new checkpoint does NOT beat the old export, the old export stays:
# its round-4 eval_final/ddim10/int8 evidence plus the round-5 eval_yuv420
# leg (run early, scripts/eval_yuv420_on_export.sh) already gate the full
# serving stack.
set -u
cd "$(dirname "$0")/.."
LOG=data/outputs/round5_seq
EXPORT=pretrained_models/uva_pusht_small
DEADLINE=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
mkdir -p "$LOG" artifacts/round5
note() { echo "[tail5] $(date +%H:%M:%S) $*" | tee -a "$LOG/tail.log"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

WIN=$(cat artifacts/round5/stage2_winner.txt 2>/dev/null || echo pusht5_s2_lr3e5)
BEST=$(ls -d "data/outputs/$WIN/checkpoints/epoch="* 2>/dev/null \
    | grep -v -e "\.tmp$" -e "\.old$" \
    | awk -F'test_mean_score=' 'NF==2 {print $2 "\t" $0}' \
    | sort -g -r | head -1 | cut -f2)
BEST=${BEST:-data/outputs/$WIN/checkpoints/latest}
note "candidate: $BEST ($(left)s to deadline)"

run_eval () {  # run_eval <name> <ckpt> <need_s> [overrides...]
    local name=$1 ckpt=$2 need=$3; shift 3
    if [ "$(left)" -lt "$need" ]; then
        note "SKIP $name ($(left)s left < ${need}s needed)"
        return 1
    fi
    note "$name (50 seeds on $ckpt; $(left)s left)"
    rm -rf "data/outputs/$name"
    timeout $(( $(left) - 120 )) python -u eval_sim.py -c "$ckpt" -o "data/outputs/$name" \
        task.env_runner.n_test=50 task.env_runner.n_train=0 \
        task.env_runner.n_streams=2 task.env_runner.latent_cache=true \
        task.env_runner.n_test_vis=4 task.env_runner.n_train_vis=0 \
        "$@" >> "$LOG/$name.log" 2>&1
    note "$name exit=$?"
    return 0
}

publish_eval () {  # copy a run's eval log into the export + commit
    local name=$1
    mkdir -p "$EXPORT/$name" && cp "data/outputs/$name"/eval_log_*.json "$EXPORT/$name/" 2>/dev/null
    git add -A "$EXPORT/$name"
    git commit -q -m "Round-5 eval evidence: $name on the flagship export" 2>/dev/null \
        || note "$name commit: nothing to commit"
}

score_of () {
    python -c "
import glob, json, sys
f = sorted(glob.glob('data/outputs/$1/eval_log_*.json'))
print(json.load(open(f[-1]))['test_mean_score'] if f else 0.0)" 2>/dev/null || echo 0
}

OLD_SCORE=$(python -c "
import glob, json
f = sorted(glob.glob('$EXPORT/eval_final/eval_log_*.json'))
print(json.load(open(f[-1]))['test_mean_score'] if f else 0.0)")
note "committed flagship eval_final: $OLD_SCORE"

# ---- candidate eval (on the raw checkpoint, not yet exported) -------------
NEW_SCORE=0
if [ -d "$BEST" ] && run_eval eval_candidate "$BEST" 1500; then
    NEW_SCORE=$(score_of eval_candidate)
    note "candidate 50-seed score: $NEW_SCORE"
fi

if python -c "exit(0 if float('$NEW_SCORE') > float('$OLD_SCORE') else 1)"; then
    note "candidate beats the flagship — exporting + full gate gauntlet"
    python -u scripts/export_flagship.py --ckpt "$BEST" --out "$EXPORT/latest" | tee -a "$LOG/tail.log"
    git add -A "$EXPORT/latest"
    git commit -q -m "Round-5 flagship export: $WIN best ($NEW_SCORE on 50 seeds)" || true
    # fresh digest -> every gate needs fresh evidence
    run_eval eval_final "$EXPORT/latest" 1300 && publish_eval eval_final
    run_eval eval_ddim10 "$EXPORT/latest" 1100 \
        model.policy.autoregressive_model_params.act_diff_testing_steps=ddim10 \
        && publish_eval eval_ddim10
    run_eval eval_int8 "$EXPORT/latest" 1000 \
        model.policy.autoregressive_model_params.act_diff_testing_steps=ddim10 \
        model.policy.serving_quant=int8 \
        && publish_eval eval_int8
    run_eval eval_yuv420 "$EXPORT/latest" 900 \
        model.policy.autoregressive_model_params.act_diff_testing_steps=ddim10 \
        model.policy.serving_quant=int8 \
        model.policy.obs_codec=yuv420 \
        && publish_eval eval_yuv420
else
    note "candidate ($NEW_SCORE) does not beat the flagship ($OLD_SCORE) — export unchanged"
fi

cp "$LOG"/*.log artifacts/round5/ 2>/dev/null
git add -A artifacts/round5
git commit -q -m "Round-5 tail logs" 2>/dev/null || true
note "DONE ($(left)s left)"
