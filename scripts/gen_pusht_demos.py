#!/usr/bin/env python
"""Generate PushT demonstrations with the scripted expert.

Stands in for the reference's human demo dataset (pusht_cchi_v7_replay.zarr,
README.md:30-34; unavailable offline). Writes a ReplayBuffer .h5 that
PushTImageDataset loads via `dataset_path`. Only episodes that reach
``--min-reward`` are kept, so the BC target is competent behavior.

    python scripts/gen_pusht_demos.py --out data/pusht_demos.h5 \
        --episodes 250 --noise 1.5
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--episodes", type=int, default=250)
    p.add_argument("--seed0", type=int, default=20000,
                   help="first env seed (eval uses 0..5 and 100000+; keep clear)")
    p.add_argument("--max-steps", type=int, default=300)
    p.add_argument("--min-reward", type=float, default=0.9)
    p.add_argument("--noise", type=float, default=1.5,
                   help="gaussian action noise (px) for state diversity")
    p.add_argument("--render-size", type=int, default=96)
    args = p.parse_args()

    from unified_video_action_tpu.data.replay_buffer import ReplayBuffer
    from unified_video_action_tpu.envs.pusht import PushTEnv
    from unified_video_action_tpu.envs.pusht_expert import (
        PushTExpert,
        rollout_expert,
    )

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    buffer = ReplayBuffer.create_empty()
    kept, tried = 0, 0
    rewards, lengths = [], []
    t0 = time.time()
    seed = args.seed0
    rng = np.random.default_rng(args.seed0)
    while kept < args.episodes:
        env = PushTEnv(render_action=False, render_size=args.render_size)
        env.seed(seed)
        env.reset()
        seed += 1
        tried += 1
        expert = PushTExpert(noise=args.noise, rng=rng)
        out = rollout_expert(env, expert, max_steps=args.max_steps, render=True)
        if out["max_reward"] < args.min_reward:
            continue
        buffer.add_episode(
            {"img": out["img"], "state": out["state"], "action": out["action"]}
        )
        kept += 1
        rewards.append(out["max_reward"])
        lengths.append(len(out["action"]))
        if kept % 5 == 0:
            el = time.time() - t0
            print(
                f"{kept}/{args.episodes} kept ({tried} tried) "
                f"mean_rew {np.mean(rewards):.3f} mean_len {np.mean(lengths):.0f} "
                f"[{el:.0f}s, {el/kept:.1f}s/ep]",
                flush=True,
            )
        if kept % 25 == 0:
            # incremental publish (atomic rename) so training can start on a
            # partial dataset while generation continues
            buffer.save(args.out + ".tmp")
            os.replace(args.out + ".tmp", args.out)

    buffer.save(args.out + ".tmp")
    os.replace(args.out + ".tmp", args.out)
    meta = {
        "episodes": kept,
        "tried": tried,
        "steps": int(sum(lengths)),
        "mean_max_reward": float(np.mean(rewards)),
        "success_rate_expert": float(np.mean([r >= 1.0 for r in rewards])),
        "mean_len": float(np.mean(lengths)),
        "noise": args.noise,
        "seed0": args.seed0,
    }
    with open(os.path.splitext(args.out)[0] + "_meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta, indent=2), flush=True)


if __name__ == "__main__":
    main()
