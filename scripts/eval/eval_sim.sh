#!/bin/bash
# Evaluate a checkpoint in simulation (reference scripts/eval/eval_sim.sh).
CKPT=${1:?usage: eval_sim.sh <checkpoint_dir> [output_dir]}
OUT=${2:-data/eval_output}
python eval_sim.py -c "$CKPT" -o "$OUT"
