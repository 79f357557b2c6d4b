#!/bin/bash
# Two-stage UMI multi-dataset recipe (reference scripts/training/train_uva_umi.sh
# semantics). Stage 2 uses the umi training conventions: shift_action=false
# and randomized history frequencies (different_history_freq).

# Stage 1: video model over the 3 umi datasets (cup / towel / mouse)
python train.py --config-name=uva_umi_multi \
    model.policy.selected_training_mode=video_model \
    model.policy.action_model_params.predict_action=false \
    output_dir=data/outputs/uva_umi_stage1 "$@"

# Stage 2: joint fine-tune, policy+full-dynamics task modes
python train.py --config-name=uva_umi_multi \
    model.policy.action_model_params.predict_action=true \
    model.policy.shift_action=false \
    model.policy.different_history_freq=true \
    model.policy.autoregressive_model_params.pretrained_model_path=data/outputs/uva_umi_stage1/checkpoints/latest \
    output_dir=data/outputs/uva_umi_stage2 "$@"
