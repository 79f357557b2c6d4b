"""Thread-pool vs process-pool DataLoader on a synthetic 3-dataset UMI load.

The UMI per-item work (zarr chunk decode + pose math + mirror masking) is
GIL-bound Python; this measures how much the process workers recover. Run:

    python benchmarks/bench_loader_workers.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from unified_video_action_tpu.data.loader import DataLoader
from unified_video_action_tpu.data.replay_buffer import ReplayBuffer
from unified_video_action_tpu.data.umi_dataset import (
    UmiLazyDataset,
    UmiMultiDataset,
    make_synthetic_umi,
)

TMP = "/tmp/uva_loader_bench"
BATCH = 56          # reference umi_lazy.yaml dataloader bs
WORKERS = int(os.environ.get("UVA_LOADER_WORKERS", str(min(14, os.cpu_count() or 4))))
N_BATCHES = int(os.environ.get("UVA_LOADER_BATCHES", "20"))


def build_multi():
    datasets = {}
    for i, name in enumerate(("cup", "towel", "mouse")):
        zpath = os.path.join(TMP, f"{name}.zarr")
        if not os.path.exists(zpath):
            buf = make_synthetic_umi(
                n_episodes=6, episode_len=200, seed=i, image_size=224
            )
            buf.save_zarr(zpath)
        lazy = ReplayBuffer.copy_from_path(zpath, lazy=True)
        datasets[name] = UmiLazyDataset(
            lazy, name=name, mask_mirror=(i == 0), random_img_sampling=True,
            val_ratio=0.0, seed=i,
        )
    return UmiMultiDataset(datasets)


def run(mode: str, ds) -> float:
    dl = DataLoader(
        ds, batch_size=BATCH, shuffle=True, seed=0,
        num_workers=WORKERS, prefetch=2, worker_mode=mode,
    )
    it = iter(dl)
    next(it)  # warm caches / workers
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += 1
        if n >= N_BATCHES:
            break
    dt = time.perf_counter() - t0
    return n * BATCH / dt


def main():
    os.makedirs(TMP, exist_ok=True)
    ds = build_multi()
    print(f"dataset: {len(ds)} items, batch {BATCH}, {WORKERS} workers")
    for mode in ("thread", "process"):
        ips = run(mode, ds)
        print(f"{mode:8s}: {ips:8.1f} items/s")


if __name__ == "__main__":
    main()
