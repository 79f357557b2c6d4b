#!/usr/bin/env python
"""Pretrain the KL-VAE tokenizer on task frames.

The reference uses a frozen pretrained kl16.ckpt (vae/vaekl.py:472-485,
utils/download.py:6-16) which cannot be fetched offline; this trains the same
architecture from scratch on the task's own frames (recon MSE + KL), saving
flax params as a flattened .npz that `vae_model_params.autoencoder_path`
loads directly (policy._load_vae_ckpt).

    python scripts/train_vae.py --data data/pusht_demos.h5 --out \
        pretrained_models/vae/pusht_vae96.npz --img-size 96 --ch 64
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="replay buffer .h5 with an 'img' key")
    p.add_argument("--out", required=True, help="output .npz params path")
    p.add_argument("--img-size", type=int, default=96)
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--embed-dim", type=int, default=16)
    p.add_argument("--ch-mult", default="1,1,2,2,4")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--kl-weight", type=float, default=1e-6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--max-frames", type=int, default=20000)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from unified_video_action_tpu.data.replay_buffer import ReplayBuffer
    from unified_video_action_tpu.models.vae import KLVae, sample_posterior

    if os.path.isdir(args.data):
        # LIBERO-layout directory of per-task hdf5s (data/demo_*/obs/agentview_rgb),
        # e.g. the kitchen-suite demo corpus from scripts/gen_kitchen_demos.py
        import glob as _glob

        import h5py

        chunks = []
        for path in sorted(_glob.glob(os.path.join(args.data, "*.hdf5"))):
            with h5py.File(path, "r") as f:
                for demo in f["data"].values():
                    chunks.append(np.asarray(demo["obs/agentview_rgb"]))
        imgs = np.concatenate(chunks, axis=0)
    else:
        rb = ReplayBuffer.load(args.data, keys=["img"])
        imgs = np.asarray(rb["img"])  # (N, H, W, 3) uint8
    if len(imgs) > args.max_frames:
        sel = np.random.default_rng(args.seed).choice(
            len(imgs), args.max_frames, replace=False
        )
        imgs = imgs[sel]
    print(f"{len(imgs)} frames from {args.data}", flush=True)

    ch_mult = tuple(int(x) for x in args.ch_mult.split(","))
    vae = KLVae(
        embed_dim=args.embed_dim, ch_mult=ch_mult,
        resolution=args.img_size, ch=args.ch, dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    params = vae.init(
        k_init,
        jnp.zeros((1, 3, args.img_size, args.img_size)),
        k_init,
    )["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"VAE params: {n_params/1e6:.1f}M (ch={args.ch}, {ch_mult})", flush=True)

    tx = optax.adamw(args.lr, b1=0.9, b2=0.95, weight_decay=1e-5)
    opt_state = tx.init(params)

    def loss_fn(params, x, key):
        mean, logvar = vae.apply({"params": params}, x, method=KLVae.encode)
        z = sample_posterior(mean, logvar, key)
        recon = vae.apply({"params": params}, z, method=KLVae.decode)
        rec = jnp.mean((recon - x) ** 2)
        kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
        return rec + args.kl_weight * kl, (rec, kl)

    @jax.jit
    def train_step(params, opt_state, x, key):
        (loss, (rec, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, rec, kl

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for step in range(args.steps):
        idx = rng.choice(len(imgs), args.batch, replace=False)
        x = imgs[idx].astype(np.float32) / 127.5 - 1.0       # [-1, 1]
        x = np.moveaxis(x, -1, 1)                            # NCHW
        key, sub = jax.random.split(key)
        params, opt_state, loss, rec, kl = train_step(
            params, opt_state, jnp.asarray(x), sub
        )
        if step % args.log_every == 0 or step == args.steps - 1:
            print(
                f"step {step} loss {float(loss):.5f} rec {float(rec):.5f} "
                f"kl {float(kl):.3f} ({time.time()-t0:.0f}s)",
                flush=True,
            )

    # save flattened params
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    flat = {}

    def _flatten(tree, prefix=""):
        for k, v in tree.items():
            kk = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                _flatten(v, kk)
            else:
                flat[kk] = np.asarray(v, dtype=np.float32)

    _flatten(jax.device_get(params))
    np.savez(args.out, **flat)
    print(f"saved {len(flat)} arrays to {args.out}", flush=True)

    # recon sanity grid (first 8 frames)
    x = imgs[:8].astype(np.float32) / 127.5 - 1.0
    x = jnp.asarray(np.moveaxis(x, -1, 1))
    mean, logvar = vae.apply({"params": params}, x, method=KLVae.encode)
    recon = vae.apply({"params": params}, mean, method=KLVae.decode)
    recon = np.asarray(recon)
    mse = float(((recon - np.asarray(x)) ** 2).mean())
    psnr = -10.0 * np.log10(max(mse * 0.25, 1e-10))  # [-1,1] range -> /4
    print(f"mode-recon mse {mse:.5f} psnr {psnr:.1f} dB", flush=True)
    try:
        import cv2

        grid = np.concatenate(
            [
                np.concatenate(list(np.moveaxis(np.asarray(x), 1, -1)), axis=1),
                np.concatenate(list(np.moveaxis(recon, 1, -1)), axis=1),
            ],
            axis=0,
        )
        grid = ((np.clip(grid, -1, 1) + 1) * 127.5).astype(np.uint8)
        out_png = os.path.splitext(args.out)[0] + "_recon.png"
        cv2.imwrite(out_png, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
        print("wrote", out_png, flush=True)
    except Exception as e:
        print("grid skipped:", e)


if __name__ == "__main__":
    main()
