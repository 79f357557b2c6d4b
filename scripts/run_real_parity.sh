#!/bin/bash
# Real pretrained-artifact gauntlet (VERDICT r2 #4).
#
# Downloads every released artifact the offline parity suite is gated on
# (kl16 VAE, MAR-B, I3D, task checkpoints — reference utils/download.py:6-29,
# fvd/download.py:40-50; CLIP arrives via the HF hub on first use), then runs
# the needs_weights test tier: importer round-trips, real-CLIP/real-FVD
# smoke checks, and eval_sim on the released pusht.ckpt to a real
# test_mean_score. Offline, downloads fail soft and each test skips with the
# artifact name — the suite stays green.
set -u
cd "$(dirname "$0")/.."
python -m unified_video_action_tpu.utils.download
exec python -m pytest tests/test_real_artifacts.py -m needs_weights -v "$@"
