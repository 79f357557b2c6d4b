#!/bin/bash
# Two-stage LIBERO-10 recipe (reference scripts/training/train_uva_libero10.sh
# semantics; language-conditioned, single-host TPU mesh).

# Stage 1: video-generation pretraining on libero demos
python train.py --config-name=uva_libero10 \
    model.policy.selected_training_mode=video_model \
    model.policy.action_model_params.predict_action=false \
    output_dir=data/outputs/uva_libero10_stage1 "$@"

# Stage 2: joint video+action fine-tune
python train.py --config-name=uva_libero10 \
    model.policy.action_model_params.predict_action=true \
    model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/uva_libero10_stage1/checkpoints/latest \
    output_dir=data/outputs/uva_libero10_stage2 "$@"
