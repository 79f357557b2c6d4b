#!/usr/bin/env python
"""Render TRAINRUN curves from training logs.jsonl files.

Usage:
    python scripts/plot_trainrun.py STAGE1_DIR [STAGE2_DIR ...] \
        --out data/outputs/trainrun.png

Reads each run dir's ``logs.jsonl`` (one record per epoch, written by
TrainWorkspace) and plots train loss, val action L2, FVD, and rollout
``test_mean_score`` against the global step, with stage boundaries marked.
Also prints a per-stage summary table to stdout (markdown) for TRAINRUN.md.
"""

import argparse
import json
import os


def load(run_dir):
    path = os.path.join(run_dir, "logs.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out", default="trainrun.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stages = [(os.path.basename(d.rstrip("/")), load(d)) for d in args.run_dirs]

    series = {
        "train_loss": ("train loss", "log"),
        "val_action_l2_distances": ("val action L2 (RMSE)", "linear"),
        "video_fvd_pixel": ("FVD (pixel fallback)", "linear"),
        "video_fvd": ("FVD (I3D)", "linear"),
        "test_mean_score": ("PushT test_mean_score", "linear"),
    }
    present = [
        k for k in series
        if any(any(k in r for r in rows) for _, rows in stages)
    ]
    fig, axes = plt.subplots(
        len(present), 1, figsize=(8, 2.6 * len(present)), sharex=True
    )
    if len(present) == 1:
        axes = [axes]

    offset = 0
    boundaries = []
    for name, rows in stages:
        xs = [offset + r["global_step"] for r in rows]
        for ax, k in zip(axes, present):
            label, scale = series[k]
            pts = [(x, r[k]) for x, r in zip(xs, rows) if k in r]
            if pts:
                ax.plot(*zip(*pts), marker=".", label=name)
                ax.set_ylabel(label, fontsize=8)
                ax.set_yscale(scale)
        if xs:
            offset = xs[-1]
            boundaries.append(offset)
    for ax in axes:
        for b in boundaries[:-1]:
            ax.axvline(b, color="gray", ls="--", lw=0.8)
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("global step")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")

    # markdown summary
    print("\n| stage | epochs | steps | final loss | best FVD | best score |")
    print("|---|---|---|---|---|---|")
    for name, rows in stages:
        if not rows:
            continue
        losses = [r.get("train_loss") for r in rows if "train_loss" in r]
        fvd = [
            r.get("video_fvd", r.get("video_fvd_pixel"))
            for r in rows
            if ("video_fvd" in r or "video_fvd_pixel" in r)
        ]
        scores = [r["test_mean_score"] for r in rows if "test_mean_score" in r]
        fvd_s = f"{min(fvd):.1f}" if fvd else "—"
        score_s = f"{max(scores):.3f}" if scores else "—"
        print(
            f"| {name} | {len(rows)} | {int(rows[-1]['global_step'])} "
            f"| {losses[-1]:.4f} | {fvd_s} | {score_s} |"
        )


if __name__ == "__main__":
    main()
