#!/usr/bin/env python
"""Dataset staging pipeline.

Equivalent of the reference's process_dataset ops
(process_dataset/download_dataset.py:38-178 — mp.Pool wget of UMI zarr.zips,
zip -> fast-local-storage -> compressed archive; extract_umi_data.py:9-67 —
per-node extraction at training time). TPU-host version: parallel fetch,
archive extraction to local SSD (or /dev/shm), and zarr->HDF5 conversion via
scripts/convert_zarr_dataset.py when zarr is available.

Usage:
    python scripts/stage_datasets.py fetch  urls.txt --out data/raw
    python scripts/stage_datasets.py extract data/raw --out /dev/shm/uva_data
"""

import argparse
import concurrent.futures as futures
import os
import subprocess
import sys
import tarfile
import zipfile


def fetch_one(url: str, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    name = url.split("/")[-1].split("?")[0]
    dst = os.path.join(out_dir, name)
    if os.path.exists(dst):
        return dst + " (cached)"
    subprocess.run(["wget", "-q", "-O", dst, url], check=True)
    return dst


def extract_one(path: str, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            z.extractall(out_dir)
    elif path.endswith((".tar", ".tar.gz", ".tgz", ".tar.lz4")):
        if path.endswith(".tar.lz4"):
            # stream-decompress via the built-in liblz4 frame binding (the
            # reference shells out to the lz4 CLI; same frame format)
            sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            from unified_video_action_tpu.utils import lz4f

            with lz4f.open_frame(path) as stream:
                with tarfile.open(fileobj=stream, mode="r|") as t:
                    t.extractall(out_dir)
        else:
            with tarfile.open(path) as t:
                t.extractall(out_dir)
    else:
        return path + " (skipped: unknown format)"
    return path + " -> " + out_dir


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("fetch")
    f.add_argument("url_file")
    f.add_argument("--out", default="data/raw")
    f.add_argument("--jobs", type=int, default=8)
    e = sub.add_parser("extract")
    e.add_argument("src_dir")
    e.add_argument("--out", default="/dev/shm/uva_data")
    e.add_argument("--jobs", type=int, default=4)
    args = parser.parse_args(argv)

    if args.cmd == "fetch":
        with open(args.url_file) as fh:
            urls = [l.strip() for l in fh if l.strip() and not l.startswith("#")]
        with futures.ThreadPoolExecutor(args.jobs) as pool:
            for result in pool.map(lambda u: fetch_one(u, args.out), urls):
                print(result)
    else:
        paths = [
            os.path.join(args.src_dir, p)
            for p in sorted(os.listdir(args.src_dir))
            if not p.startswith(".")
        ]
        with futures.ThreadPoolExecutor(args.jobs) as pool:
            for result in pool.map(lambda p: extract_one(p, args.out), paths):
                print(result)


if __name__ == "__main__":
    main()
