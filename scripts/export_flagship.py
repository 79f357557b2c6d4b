#!/usr/bin/env python
"""Export a trained checkpoint as a slim, repo-committable deployment artifact.

A full training checkpoint carries optimizer moments + raw params + EMA params
(~4x the weight payload); environment resets wipe ``data/`` between rounds, so
anything not committed is lost (NEXT_ROUND.md). This writes a *slim* orbax
checkpoint — EMA weights (bf16) + frozen VAE + normalizer + embedded cfg —
small enough to commit, loadable by ``eval_sim.py -c``, ``bench.py``'s
deployed tier, and the policy's stage-bootstrap importer
(policy.py ``_load_mar_ckpt`` orbax branch).

    python scripts/export_flagship.py \
        --ckpt data/outputs/pusht_small_stage2/checkpoints/epoch=0008-... \
        --out pretrained_models/uva_pusht_small/latest

The reference's analogue is its released ``*.ckpt`` deployment payloads
(eval_sim.py:29-47 loads cfg+EMA from one file); here the export doubles as
the cross-round persistence mechanism.
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="source training checkpoint dir")
    p.add_argument("--out", required=True, help="export dir (overwritten)")
    p.add_argument(
        "--dtype", default="bfloat16", choices=["bfloat16", "float32"],
        help="weight storage dtype (bf16 halves the payload; compute is bf16 anyway)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    src = os.path.abspath(args.ckpt)
    out = os.path.abspath(args.out)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.join(src, "state"))
    restored.pop("opt_state", None)
    ema = restored.get("ema_params") or restored["mar_params"]
    vae = restored.get("vae_params")

    store_dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def cast(x):
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.floating) or x.dtype == jnp.bfloat16:
            return np.asarray(jnp.asarray(x, dtype=store_dt))
        return x

    payload = {"step": np.asarray(restored.get("step", 0)), "ema_params": jax.tree.map(cast, ema)}
    if vae is not None:
        payload["vae_params"] = jax.tree.map(cast, vae)

    tmp = out + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    ckptr.save(os.path.join(tmp, "state"), payload)
    ckptr.wait_until_finished()

    meta = {}
    meta_path = os.path.join(src, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta["slim"] = True
    meta["export_source"] = os.path.relpath(src, os.getcwd()) if src.startswith(os.getcwd()) else src
    meta["export_dtype"] = args.dtype
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    norm = os.path.join(src, "normalizer.npz")
    if os.path.exists(norm):
        shutil.copy2(norm, os.path.join(tmp, "normalizer.npz"))

    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    size = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(out)
        for f in fs
    )
    print(f"exported {src} -> {out} ({size / 1e6:.1f} MB, {args.dtype})")


if __name__ == "__main__":
    main()
