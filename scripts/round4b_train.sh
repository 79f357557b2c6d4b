#!/bin/bash
# Round-4 flagship training: push the trained PushT score past
# MIN_DEPLOYED_SCORE (0.25) toward 0.5 (VERDICT r3 items 1+3).
#
# Levers vs the round-3 recipe (TRAINRUN.md): ~2-3x the demonstrations
# (committed 150 + background-generated extras, merged), mar_base WIDTH at
# the native 96 px resolution (d=768, 12+12 blocks — the reference's model
# capacity on the chip-sized token budget), early_stop_patience so long runs
# keep the peak, and the stage-1 topk now selects by the deterministic
# VAE-latent Frechet (train.py forces video_fvd_vae monitoring for
# video-only runs).
#
# All 50-seed evals run ON THE EXPORT and are digest-stamped (eval_sim.py),
# so bench.py's provenance-tied gates accept them after any data/ wipe.
set -u
cd "$(dirname "$0")/.."
LOG=data/outputs/round4b_seq
EXPORT=pretrained_models/uva_pusht_small
MODEL_SIZE=${MODEL_SIZE:-mar_base}
DEMOS=data/pusht_demos_merged.h5
mkdir -p "$LOG"
note() { echo "[seq4b] $(date +%H:%M:%S) $*" | tee -a "$LOG/seq.log"; }

# ---- demos: merge the committed base with the background extras ----------
if [ ! -f "$DEMOS" ] || [ "${REMERGE:-0}" = "1" ]; then
    python -u scripts/merge_demos.py --out "$DEMOS" \
        data/pusht_demos.h5 data/pusht_demos_extra.h5 | tee -a "$LOG/seq.log"
fi
note "demos ready: $(stat -c%s "$DEMOS") bytes"

# ---- stage 1: video-only pretrain (topk on video_fvd_vae) ----------------
if [ ! -d data/outputs/pusht4b_stage1/checkpoints/latest ]; then
    note "stage 1 ($MODEL_SIZE @ 96 px)"
    for attempt in 1 2 3; do
        T0=$(date +%s)
        timeout "${STAGE1_TIMEOUT:-7200}" python -u train.py --config-name=uva_pusht_small \
            model.policy.selected_training_mode=video_model \
            model.policy.action_model_params.predict_action=false \
            model.policy.autoregressive_model_params.model_size="$MODEL_SIZE" \
            task.dataset.dataset_path="$DEMOS" \
            training.num_epochs="${STAGE1_EPOCHS:-6}" \
            training.rollout_every=1000 \
            training.sample_every=1 \
            training.checkpoint_every=1 \
            output_dir=data/outputs/pusht4b_stage1 \
            >> "$LOG/stage1.log" 2>&1
        RC=$?
        note "stage1 attempt $attempt exit=$RC after $(( $(date +%s) - T0 ))s"
        [ "$RC" -eq 0 ] && break
        [ "$attempt" -lt 3 ] && MAX_WAIT=7200 bash scripts/tpu_watch.sh >> "$LOG/seq.log" 2>&1
    done
fi

# stop the demo generator before stage 2 (1 vCPU: it halves dispatch rate)
if [ -f /tmp/gendemos.pid ] && kill -0 "$(cat /tmp/gendemos.pid)" 2>/dev/null; then
    kill "$(cat /tmp/gendemos.pid)" 2>/dev/null
    note "demo generator stopped for stage 2"
    # fold in whatever extras landed after the first merge
    python -u scripts/merge_demos.py --out "$DEMOS" \
        data/pusht_demos.h5 data/pusht_demos_extra.h5 | tee -a "$LOG/seq.log"
fi

# ---- stage 2: joint video+action -----------------------------------------
note "stage 2 ($MODEL_SIZE, early_stop_patience=${PATIENCE:-3})"
STAGE2_OK=0
for attempt in 1 2 3; do
    T0=$(date +%s)
    timeout "${STAGE2_TIMEOUT:-14400}" python -u train.py --config-name=uva_pusht_small \
        model.policy.selected_training_mode=policy_model_full_dynamics_model \
        model.policy.action_model_params.predict_action=true \
        model.policy.autoregressive_model_params.model_size="$MODEL_SIZE" \
        model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/pusht4b_stage1/checkpoints/latest \
        task.dataset.dataset_path="$DEMOS" \
        training.num_epochs="${STAGE2_EPOCHS:-36}" \
        training.rollout_every="${ROLLOUT_EVERY:-4}" \
        training.early_stop_patience="${PATIENCE:-3}" \
        checkpoint.topk.k=2 \
        output_dir=data/outputs/pusht4b_stage2 \
        >> "$LOG/stage2.log" 2>&1
    RC=$?
    note "stage2 attempt $attempt exit=$RC after $(( $(date +%s) - T0 ))s"
    if [ "$RC" -eq 0 ]; then STAGE2_OK=1; break; fi
    [ "$attempt" -lt 3 ] && MAX_WAIT=7200 bash scripts/tpu_watch.sh >> "$LOG/seq.log" 2>&1
done
if [ "$STAGE2_OK" -ne 1 ]; then
    # a timeout mid-run still leaves topk checkpoints worth exporting —
    # only bail when stage 2 produced nothing at all
    if ls data/outputs/pusht4b_stage2/checkpoints/epoch=* >/dev/null 2>&1; then
        note "stage 2 did not exit 0 but topk checkpoints exist — exporting best anyway"
    else
        note "stage 2 never exited 0 and left no checkpoints — skipping export/eval/bench"
        exit 1
    fi
fi

# best top-k checkpoint by the monitored score, numerically
BEST=$(ls -d data/outputs/pusht4b_stage2/checkpoints/epoch=* 2>/dev/null \
    | grep -v -e "\.tmp$" -e "\.old$" \
    | awk -F'test_mean_score=' 'NF==2 {print $2 "\t" $0}' \
    | sort -g -r | head -1 | cut -f2)
BEST=${BEST:-data/outputs/pusht4b_stage2/checkpoints/latest}
note "export $BEST -> $EXPORT/latest"
python -u scripts/export_flagship.py --ckpt "$BEST" --out "$EXPORT/latest" | tee -a "$LOG/seq.log"

run_eval () {
    local name=$1; shift
    note "$name (50 seeds, on the export)"
    rm -rf "data/outputs/$name"
    timeout 5400 python -u eval_sim.py -c "$EXPORT/latest" -o "data/outputs/$name" \
        task.env_runner.n_test=50 \
        task.env_runner.n_streams=2 task.env_runner.latent_cache=true \
        task.env_runner.n_test_vis=4 task.env_runner.n_train_vis=2 \
        "$@" >> "$LOG/$name.log" 2>&1
    note "$name exit=$?"
    mkdir -p "$EXPORT/$name" && cp "data/outputs/$name"/eval_log_*.json "$EXPORT/$name/" 2>/dev/null
}
run_eval eval_final task.env_runner.n_train=6
run_eval eval_ddim10 task.env_runner.n_train=0 \
    model.policy.autoregressive_model_params.act_diff_testing_steps=ddim10
run_eval eval_int8 task.env_runner.n_train=0 \
    model.policy.autoregressive_model_params.act_diff_testing_steps=ddim10 \
    model.policy.serving_quant=int8

mkdir -p artifacts/round4
cp data/outputs/pusht4b_stage1/logs.jsonl artifacts/round4/stage1b_logs.jsonl 2>/dev/null
cp data/outputs/pusht4b_stage2/logs.jsonl artifacts/round4/stage2b_logs.jsonl 2>/dev/null
cp data/outputs/eval_final/eval_log_*.json artifacts/round4/ 2>/dev/null
cp data/pusht_demos_merged_meta.json artifacts/round4/ 2>/dev/null
cp "$LOG/seq.log" artifacts/round4/sequence_b.log 2>/dev/null

# ---- commit the export + digest-stamped evidence (survives data/ wipes;
# the round-3 headline died because exactly this was left untracked) -------
SCORE=$(python3 -c "
import glob, json
logs = sorted(glob.glob('$EXPORT/eval_final/eval_log_*.json'))
print(json.load(open(logs[-1])).get('test_mean_score') if logs else 'none')" 2>/dev/null)
note "committing export + eval evidence (eval_final score: $SCORE)"
git add -A "$EXPORT" artifacts/round4 2>> "$LOG/seq.log"
git commit -m "Round-4 flagship retrain: export + 50-seed eval evidence (score $SCORE)" \
    >> "$LOG/seq.log" 2>&1 || note "git commit failed or nothing to commit"

note "bench.py (deployed tier from the export)"
timeout 3600 python -u bench.py > artifacts/round4/bench_line.json 2> "$LOG/bench.err"
note "bench exit=$?"
tail -1 artifacts/round4/bench_line.json | tee -a "$LOG/seq.log"
note "DONE"
