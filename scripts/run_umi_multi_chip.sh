#!/bin/bash
# Drive the UMI multi-dataset training path END-TO-END on the real chip
# (VERDICT r3 item 4): synthetic 3-dataset UMI zarr corpus -> lazy chunked
# reads -> UmiMultiDataset (mirror masking, CLIP-fallback language latents,
# random history sampling) -> process-worker loader -> bf16 stage-1 training
# for >=2 epochs. Records steps/s + loader occupancy for PERF.md.
# Reference: dataset/umi_lazy_dataset.py:246-336, config/uva_umi_multi.yaml.
set -eu
cd "$(dirname "$0")/.."
OUT=artifacts/round4
mkdir -p "$OUT"

if [ ! -d data/umi/cup.zarr ]; then
    echo "[umi] generating synthetic 3-dataset zarr corpus"
    python -u scripts/gen_synthetic_umi.py --root data/umi \
        --episodes "${UMI_EPISODES:-12}" | tee "$OUT/umi_gen.log"
fi

# loader-only pass: one epoch through the exact training loader (process
# workers) with no device work — the denominator for loader occupancy
python -u - <<'EOF' | tee "$OUT/umi_loader_only.json"
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

echo "[umi] stage-1 training, 2 epochs, process-worker loader, real chip"
rm -rf data/outputs/umi_multi_chip
timeout -k 180 ${UMI_TIMEOUT:-5400} python -u train.py --config-name=uva_umi_multi \
    model.policy.selected_training_mode=video_model \
    model.policy.action_model_params.predict_action=false \
    model.policy.autoregressive_model_params.model_size=mar_small \
    model.policy.autoregressive_model_params.pretrained_model_path=null \
    model.policy.vae_model_params.autoencoder_path=null \
    model.policy.vae_model_params.ddconfig.ch=64 \
    training.num_epochs=2 training.val_every=1 training.sample_every=2 \
    training.checkpoint_every=1 training.resume=false \
    dataloader.batch_size=16 dataloader.num_workers=4 \
    dataloader.worker_mode=process \
    output_dir=data/outputs/umi_multi_chip \
    2>&1 | tail -40 | tee "$OUT/umi_multi_chip.log"
cp data/outputs/umi_multi_chip/logs.jsonl "$OUT/umi_multi_chip_logs.jsonl"
tail -2 "$OUT/umi_multi_chip_logs.jsonl"
echo "[umi] done"
