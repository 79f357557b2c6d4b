"""Planar YUV 4:2:0 observation codec for the serving path.

The deployed serving tier is wall-clocked by host->device observation bytes,
not compute: each action chunk ships 2 fresh 96x96 uint8 RGB frames (55 KB)
through a link that the chip outruns ~2x (PERF.md "tunnel-H2D-bandwidth-bound"
table; the same program with device-resident obs runs 1099 chunks/s vs ~527).
Real camera stacks deliver planar YUV 4:2:0 natively (the reference's UVC
capture path, umi/real_world/uvc_camera.py:22-330, consumes such frames from
V4L2), so shipping the 4:2:0 buffer and reconstructing RGB in-program halves
the wire bytes with a standard, camera-shaped format rather than a bespoke
compressor.

Encode runs on the host/client in numpy (in a real deployment the camera ISP
already did it); decode is pure jnp inside the jitted predict program, where
XLA fuses the ~10 elementwise ops into the VAE encode that follows. BT.601
full-range coefficients both ways. The roundtrip is lossy only in chroma
(2x2 subsampling) and Y rounding; task-level fidelity is quality-gated the
same way as int8/ddim10 serving: bench.py engages the codec only when a real
50-seed eval run *through this exact roundtrip* kept >=90% of the full-score
(eval_sim.py stamps ``obs_codec`` into the eval log).
"""

from __future__ import annotations

import numpy as np

CODECS = ("yuv420",)


def packed_size(h: int, w: int) -> int:
    """Bytes per frame: full-res Y plane + 2x2-subsampled U and V planes."""
    if h % 2 or w % 2:
        raise ValueError(f"yuv420 needs even dims, got {h}x{w}")
    return h * w + 2 * (h // 2) * (w // 2)


def hw_from_packed(p: int) -> int:
    """Recover the (square) frame side from the packed length: for h == w,
    p = h*w*3/2. Serving frames in this framework are square (PushT 96,
    UMI 224); non-square layouts would need an explicit shape channel."""
    h = int(round((p * 2 / 3) ** 0.5))
    if packed_size(h, h) != p:
        raise ValueError(f"packed length {p} is not a square yuv420 frame")
    return h


def encode_yuv420(rgb: np.ndarray) -> np.ndarray:
    """(..., 3, H, W) uint8 RGB -> (..., packed_size) uint8 planar YUV420.

    BT.601 full-range: Y in [0,255] uses the full code range (no 16..235
    studio swing) so the Y plane round-trips RGB grays exactly up to +-0.5
    rounding.
    """
    if rgb.dtype != np.uint8:
        raise ValueError(f"encode_yuv420 expects uint8, got {rgb.dtype}")
    *lead, c, h, w = rgb.shape
    if c != 3:
        raise ValueError(f"expected channel-first RGB, got shape {rgb.shape}")
    x = rgb.reshape(-1, 3, h, w).astype(np.float32)
    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # 2x2 mean subsample of the chroma planes
    u = u.reshape(-1, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    v = v.reshape(-1, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    n = x.shape[0]
    packed = np.concatenate(
        [
            np.clip(np.rint(y), 0, 255).reshape(n, -1),
            np.clip(np.rint(u), 0, 255).reshape(n, -1),
            np.clip(np.rint(v), 0, 255).reshape(n, -1),
        ],
        axis=1,
    ).astype(np.uint8)
    return packed.reshape(*lead, packed.shape[-1])


def decode_yuv420(packed, h: int = None, w: int = None):
    """(..., packed_size) uint8 -> (..., 3, H, W) float32 RGB in [0, 1].

    Pure jnp (trace-safe): nearest-neighbor chroma upsample + BT.601 inverse,
    all elementwise — XLA fuses it into whatever consumes the frames.
    """
    import jax.numpy as jnp

    p = packed.shape[-1]
    if h is None:
        h = w = hw_from_packed(p)
    elif w is None:
        w = h
    lead = packed.shape[:-1]
    x = packed.reshape(-1, p).astype(jnp.float32)
    ny = h * w
    nc = (h // 2) * (w // 2)
    y = x[:, :ny].reshape(-1, h, w)
    u = x[:, ny : ny + nc].reshape(-1, h // 2, w // 2) - 128.0
    v = x[:, ny + nc :].reshape(-1, h // 2, w // 2) - 128.0
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    rgb = jnp.stack([r, g, b], axis=1)
    return jnp.clip(rgb / 255.0, 0.0, 1.0).reshape(*lead, 3, h, w)
