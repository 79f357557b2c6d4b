#!/bin/bash
# UMI-multi flagship-path chip evidence, round 5 (VERDICT r4 next-round #6):
# >=3-epoch steady state with the process-worker loader on the REAL task-mode
# pair (policy_model + full_dynamic_model, action head on — the reference's
# uva_umi_multi recipe, config/uva_umi_multi.yaml:39-50), recording per-epoch
# steps/s (epoch 0 isolates compile), loader occupancy, and val action-L2 —
# and a deliberate mid-run SIGTERM + resume exercising the bounded-wait
# preemption fix (the round-4 UMI stall) end to end.
# Reference: dataset/umi_lazy_dataset.py:246-336.
set -eu
cd "$(dirname "$0")/.."
OUT=artifacts/round5
RUN=data/outputs/umi_multi_chip5
mkdir -p "$OUT"

if [ ! -d data/umi/cup.zarr ]; then
    echo "[umi5] generating synthetic 3-dataset zarr corpus"
    python -u scripts/gen_synthetic_umi.py --root data/umi \
        --episodes "${UMI_EPISODES:-12}" | tee "$OUT/umi_gen.log"
fi

# loader-only pass: the denominator for loader occupancy
python -u - <<'EOF' | tee "$OUT/umi5_loader_only.json"
import json, time
from unified_video_action_tpu.config import load_config, get_class
cfg = load_config("uva_umi_multi")
ds_cfg = dict(cfg["task"]["dataset"]); target = ds_cfg.pop("_target_")
ds_cfg.pop("normalizer_type", None)
ds = get_class(target)(**ds_cfg)
from unified_video_action_tpu.data.loader import DataLoader
loader = DataLoader(ds, 16, shuffle=True, seed=0, num_workers=4,
                    worker_mode="process", prefetch=2)
t0 = time.time(); n = 0
for batch in loader:
    n += 1
dt = time.time() - t0
print(json.dumps({"loader_only_batches": n, "loader_only_s": round(dt, 1),
                  "loader_only_batches_per_s": round(n / dt, 3)}))
EOF

train_cmd () {
    python -u train.py --config-name=uva_umi_multi \
        model.policy.autoregressive_model_params.model_size=mar_small \
        model.policy.autoregressive_model_params.pretrained_model_path=null \
        model.policy.vae_model_params.autoencoder_path=null \
        model.policy.vae_model_params.ddconfig.ch=64 \
        training.num_epochs=4 training.val_every=1 training.sample_every=0 \
        training.checkpoint_every=1 training.resume=true \
        dataloader.batch_size=16 dataloader.num_workers=4 \
        dataloader.worker_mode=process \
        output_dir="$RUN"
}

echo "[umi5] leg 1: train until mid-epoch-2, then SIGTERM (preemption drill)"
rm -rf "$RUN"
train_cmd > "$OUT/umi5_leg1.log" 2>&1 &
TPID=$!
echo "$TPID" > /tmp/umi5_train.pid
# wait for epoch 1 to land in the jsonl, then give epoch 2 ~120s to get
# mid-flight before the SIGTERM
for i in $(seq 1 240); do
    sleep 15
    kill -0 "$TPID" 2>/dev/null || break
    if [ -f "$RUN/logs.jsonl" ] && [ "$(grep -c '"epoch"' "$RUN/logs.jsonl")" -ge 2 ]; then
        sleep 120
        echo "[umi5] SIGTERM mid-epoch-2 ($(date +%H:%M:%S))"
        kill -TERM "$TPID" 2>/dev/null || true
        break
    fi
done
wait "$TPID" || true
echo "[umi5] leg 1 exited; checkpoints: $(ls "$RUN/checkpoints" 2>/dev/null | tr '\n' ' ')"

echo "[umi5] leg 2: resume to completion"
timeout -k 180 "${UMI_TIMEOUT:-4500}" bash -c "$(declare -f train_cmd); train_cmd" \
    > "$OUT/umi5_leg2.log" 2>&1 || true
tail -3 "$OUT/umi5_leg2.log"
cp "$RUN/logs.jsonl" "$OUT/umi5_logs.jsonl"
python - <<'EOF'
import json
rows = [json.loads(l) for l in open("artifacts/round5/umi5_logs.jsonl")]
for r in rows:
    print({k: round(v, 4) if isinstance(v, float) else v
           for k, v in r.items()
           if k in ("epoch", "global_step", "epoch_time", "action_loss",
                     "diffusion_loss", "val_action_l2_distances")})
EOF
echo "[umi5] done"
