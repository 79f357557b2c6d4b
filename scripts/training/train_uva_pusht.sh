#!/bin/bash
# Two-stage PushT training recipe (reference scripts/training/train_uva_pusht.sh
# semantics, single-host TPU: the mesh spans all local chips automatically).

# Stage 1: video-generation pretraining (no action head)
python train.py --config-name=uva_pusht \
    model.policy.selected_training_mode=video_model \
    model.policy.action_model_params.predict_action=false \
    output_dir=data/outputs/uva_pusht_stage1 "$@"

# Stage 2: joint video+action fine-tune from the stage-1 checkpoint
python train.py --config-name=uva_pusht \
    model.policy.action_model_params.predict_action=true \
    model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/uva_pusht_stage1/checkpoints/latest \
    output_dir=data/outputs/uva_pusht_stage2 "$@"
