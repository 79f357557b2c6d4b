#!/usr/bin/env python
"""Convert between replay-buffer formats (zarr v2 ↔ HDF5).

Reference zarr stores (e.g. pusht_cchi_v7_replay.zarr, UMI episode stores,
robomimic/libero *.zarr.zip caches with Jpeg2k chunks) load DIRECTLY via the
built-in zarr reader (``data/zarrlite.py``) — no conversion step is required
anymore. This script remains for producing the compact HDF5 format (or a zarr
copy of an HDF5 buffer) when staging to local SSD.

Usage:
    python scripts/convert_zarr_dataset.py in.zarr out.h5 [--keys img state action]
    python scripts/convert_zarr_dataset.py in.h5 out.zarr
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--keys", nargs="*", default=None)
    args = parser.parse_args(argv)

    sys.path.insert(0, ".")
    from unified_video_action_tpu.data.replay_buffer import ReplayBuffer

    buf = ReplayBuffer.copy_from_path(args.src, keys=args.keys)
    if args.dst.endswith((".zarr", ".zip")):
        buf.save_zarr(args.dst)
    else:
        buf.save(args.dst)
    print(
        f"wrote {args.dst}: {buf.n_episodes} episodes, {buf.n_steps} steps, "
        f"keys={list(buf.keys())}"
    )


if __name__ == "__main__":
    main()
