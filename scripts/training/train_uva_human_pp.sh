#!/bin/bash
# Human pick-place keypoint recipe (reference train_uva_human_pp.sh):
# no env runner — monitored by val_action_l2_distances (keypoint L2).
python train.py --config-name=uva_human_pp \
    model.policy.action_model_params.predict_action=true \
    output_dir=data/outputs/uva_human_pp "$@"
