#!/usr/bin/env python
"""Merge PushT demo ReplayBuffer files into one training dataset.

The committed base corpus (data/pusht_demos.h5, 150 episodes) and the
per-round background-generated extras (gen_pusht_demos.py writes a separate
file with a disjoint seed range) become a single file for the dataset path.

    python scripts/merge_demos.py --out data/pusht_demos_merged.h5 \
        data/pusht_demos.h5 data/pusht_demos_extra.h5
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from unified_video_action_tpu.data.replay_buffer import ReplayBuffer

    merged = ReplayBuffer.create_empty()
    total = 0
    for path in args.inputs:
        if not os.path.exists(path):
            print(f"skip (missing): {path}")
            continue
        buf = ReplayBuffer.load(path)
        for i in range(buf.n_episodes):
            merged.add_episode(buf.get_episode(i))
        print(f"{path}: +{buf.n_episodes} episodes ({buf.n_steps} steps)")
        total += buf.n_episodes
    merged.save(args.out + ".tmp")
    os.replace(args.out + ".tmp", args.out)
    meta = {"episodes": merged.n_episodes, "steps": merged.n_steps,
            "sources": args.inputs}
    with open(os.path.splitext(args.out)[0] + "_meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
