#!/bin/bash
# Single-chip PushT training to competence (TRAINRUN.md recipe).
#
# Mirrors the reference's two-stage recipe
# (scripts/training/train_uva_pusht.sh:1-24) at the chip-sized config
# (model/uva_small96.yaml): stage 1 video-only pretrain, stage 2 joint
# video+action fine-tune from the stage-1 checkpoint with the reference's own
# umi stage-2 task-mode pair (config/task/umi_multi.yaml: policy_model +
# full_dynamic_model). Prereqs:
#   python scripts/gen_pusht_demos.py --out data/pusht_demos.h5 --episodes 200
#   python scripts/train_vae.py --data data/pusht_demos.h5 \
#       --out pretrained_models/vae/pusht_vae96.npz --img-size 96 --ch 64
set -e
cd "$(dirname "$0")/../.."

STAGE1_EPOCHS="${STAGE1_EPOCHS:-6}"
STAGE2_EPOCHS="${STAGE2_EPOCHS:-40}"

# Stage 1: video-generation pretraining (no action head)
python -u train.py --config-name=uva_pusht_small \
    model.policy.selected_training_mode=video_model \
    model.policy.action_model_params.predict_action=false \
    training.num_epochs="$STAGE1_EPOCHS" \
    training.rollout_every=1000 \
    output_dir=data/outputs/pusht_small_stage1 "$@"

# Stage 2: joint video+action fine-tune from the stage-1 checkpoint
python -u train.py --config-name=uva_pusht_small \
    model.policy.selected_training_mode=policy_model_full_dynamics_model \
    model.policy.action_model_params.predict_action=true \
    model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/pusht_small_stage1/checkpoints/latest \
    training.num_epochs="$STAGE2_EPOCHS" \
    output_dir=data/outputs/pusht_small_stage2 "$@"
