#!/usr/bin/env python
"""Generate the 3-dataset synthetic UMI zarr corpus for the on-chip
multi-dataset training drive (VERDICT r3 item 4).

The reference's flagship scale path trains UmiMultiDataset over three
lazy-zarr task datasets (cup/towel/mouse, config/uva_umi_multi.yaml:1-95,
dataset/umi_lazy_dataset.py:246-336). The real archives cannot be fetched
here (no egress); this writes the same layout — per-episode camera0_rgb at
224 px uint8, eef pose/gripper series, demo start pose — as reference-format
zarr v2 directory stores that ``UmiLazyDataset`` reads lazily (chunked,
LRU-cached), exercising the identical input pipeline.

    python scripts/gen_synthetic_umi.py --root data/umi --episodes 12
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data/umi")
    p.add_argument("--episodes", type=int, default=12)
    p.add_argument("--episode-len", type=int, default=120)
    p.add_argument("--image-size", type=int, default=224)
    args = p.parse_args()

    from unified_video_action_tpu.data.umi_dataset import make_synthetic_umi

    os.makedirs(args.root, exist_ok=True)
    for i, name in enumerate(("cup", "towel", "mouse")):
        t0 = time.time()
        buf = make_synthetic_umi(
            n_episodes=args.episodes,
            episode_len=args.episode_len,
            seed=100 + i,
            image_size=args.image_size,
        )
        path = os.path.join(args.root, f"{name}.zarr")
        buf.save_zarr(path)
        n = buf.n_steps
        print(f"{path}: {args.episodes} eps, {n} steps, "
              f"{time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
