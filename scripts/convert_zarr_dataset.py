#!/usr/bin/env python
"""Convert a reference zarr replay buffer (e.g. pusht_cchi_v7_replay.zarr or a
UMI episode store) into this framework's HDF5 replay format.

Run on a machine that has zarr installed (this framework itself does not
depend on zarr); the output loads with
``unified_video_action_tpu.data.replay_buffer.ReplayBuffer.load``.

Usage:
    python scripts/convert_zarr_dataset.py in.zarr out.h5 [--keys img state action]
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--keys", nargs="*", default=None)
    args = parser.parse_args(argv)

    try:
        import zarr
    except ImportError:
        sys.exit("zarr is required for conversion; run on a machine that has it")

    import numpy as np

    sys.path.insert(0, ".")
    from unified_video_action_tpu.data.replay_buffer import ReplayBuffer

    root = zarr.open(args.src, mode="r")
    data_group = root["data"]
    keys = args.keys or list(data_group.keys())
    data = {k: np.asarray(data_group[k][:]) for k in keys}
    episode_ends = np.asarray(root["meta"]["episode_ends"][:])
    buf = ReplayBuffer(data, episode_ends)
    buf.save(args.dst)
    print(
        f"wrote {args.dst}: {buf.n_episodes} episodes, {buf.n_steps} steps, "
        f"keys={list(buf.keys())}"
    )


if __name__ == "__main__":
    main()
