#!/bin/bash
# Two-stage robomimic tool-hang recipe (reference
# scripts/training/train_uva_toolhang.sh semantics: two cameras incl. the
# wrist stream + proprioception).

python train.py --config-name=uva_toolhang \
    model.policy.selected_training_mode=video_model \
    model.policy.action_model_params.predict_action=false \
    output_dir=data/outputs/uva_toolhang_stage1 "$@"

python train.py --config-name=uva_toolhang \
    model.policy.action_model_params.predict_action=true \
    model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/uva_toolhang_stage1/checkpoints/latest \
    output_dir=data/outputs/uva_toolhang_stage2 "$@"
