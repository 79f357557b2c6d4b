#!/bin/bash
# Launch the real-robot ZMQ inference server (reference scripts/eval/eval_real.sh).
CKPT=${1:?usage: eval_real.sh <checkpoint_dir> [bind]}
BIND=${2:-tcp://0.0.0.0:8766}
python eval_real.py -c "$CKPT" --bind "$BIND" \
    --language-latents prepared_data/language_latents.pkl
