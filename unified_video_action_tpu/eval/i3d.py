"""InceptionI3D video embedder for FVD, in flax (NDHWC).

Equivalent of the reference's ``pytorch_i3d.InceptionI3d`` (fvd/pytorch_i3d.py:
1-419, Kinetics-400 head) used by ``get_fvd_logits`` (fvd/fvd.py:118-132).
Weights import from the reference's ``i3d_pretrained_400.pt`` torch state dict
when present (utils/download gets it via gdown in the reference; offline
environments fall back to pixel-statistics FVD, see eval/metrics.py).

Structure: stem convs -> 9 inception blocks -> global avg pool -> 400-way
logits. All convs are 'SAME'-padded with BatchNorm(eps=1e-3) + ReLU.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

I3D_WEIGHTS_PATH = os.environ.get(
    "I3D_WEIGHTS", "pretrained_models/i3d_pretrained_400.pt"
)


class Unit3D(nn.Module):
    out_channels: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.stride),
            padding="SAME",
            use_bias=not self.use_bn,
            name="conv3d",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-3, momentum=0.99, name="bn"
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionBlock(nn.Module):
    # (b0, b1a, b1b, b2a, b2b, b3b)
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = Unit3D(c[0], name="b0")(x)
        b1 = Unit3D(c[1], name="b1a")(x)
        b1 = Unit3D(c[2], kernel=(3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(c[3], name="b2a")(x)
        b2 = Unit3D(c[4], kernel=(3, 3, 3), name="b2b")(b2)
        b3 = nn.max_pool(
            x, (3, 3, 3), strides=(1, 1, 1), padding="SAME"
        )
        b3 = Unit3D(c[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        """x: (B, T, H, W, 3) in [-1, 1] -> (B, num_classes) logits."""
        x = Unit3D(64, kernel=(7, 7, 7), stride=(2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, kernel=(3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionBlock((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = InceptionBlock((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = InceptionBlock((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = InceptionBlock((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = InceptionBlock((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = InceptionBlock((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        # global average pool over (T, H, W), then logits
        x = x.mean(axis=(1, 2, 3), keepdims=True)
        x = Unit3D(
            self.num_classes, use_bn=False, activation=False, name="logits"
        )(x)
        return x[:, 0, 0, 0, :]


# torch module name (reference pytorch_i3d) -> flax path prefix
_STEM_MAP = {
    "Conv3d_1a_7x7": "Conv3d_1a_7x7",
    "Conv3d_2b_1x1": "Conv3d_2b_1x1",
    "Conv3d_2c_3x3": "Conv3d_2c_3x3",
    "logits": "logits",
}
_BRANCH_MAP = {
    "b0": "b0", "b1a": "b1a", "b1b": "b1b",
    "b2a": "b2a", "b2b": "b2b", "b3b": "b3b",
}


def import_i3d(sd: dict) -> dict:
    """Convert the reference torch I3D state dict into flax params/batch_stats.

    torch naming: ``<Block>.<unit>.conv3d.weight`` (O,I,T,H,W), ``.bn.{weight,
    bias,running_mean,running_var}``; branches named b0/b1a/.../b3b inside
    Mixed_* modules.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, v):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v

    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        # normalize: [block, (branch), unit..., leaf]
        if parts[-2] == "conv3d":
            flax_path = tuple(parts[:-2]) + ("conv3d",)
            if parts[-1] == "weight":
                put(params, flax_path + ("kernel",), np.transpose(v, (2, 3, 4, 1, 0)))
            else:
                put(params, flax_path + ("bias",), v)
        elif parts[-2] == "bn":
            flax_path = tuple(parts[:-2]) + ("bn",)
            leaf = parts[-1]
            if leaf == "weight":
                put(params, flax_path + ("scale",), v)
            elif leaf == "bias":
                put(params, flax_path + ("bias",), v)
            elif leaf == "running_mean":
                put(batch_stats, flax_path + ("mean",), v)
            elif leaf == "running_var":
                put(batch_stats, flax_path + ("var",), v)
    return {"params": params, "batch_stats": batch_stats}


def load_i3d_embedder(
    weights_path: str = I3D_WEIGHTS_PATH, batch: int = 16
) -> Callable[[np.ndarray], np.ndarray]:
    """(B, T, H, W, 3) uint8/float videos -> (B, 400) logits. Resizes to
    224 center-crop and scales to [-1, 1] (fvd/fvd.py:7-50)."""
    if not os.path.exists(weights_path):
        raise FileNotFoundError(weights_path)
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = jax.tree.map(jnp.asarray, import_i3d(sd))
    model = InceptionI3d()

    @jax.jit
    def run(v):
        return model.apply(variables, v)

    def embed(videos: np.ndarray) -> np.ndarray:
        v = np.asarray(videos, np.float32)
        if v.max() > 1.5:
            v = v / 255.0
        B, T, H, W, C = v.shape
        v = jax.image.resize(
            jnp.asarray(v), (B, T, 224, 224, C), method="linear"
        )
        v = v * 2.0 - 1.0
        outs = []
        for i in range(0, B, batch):
            outs.append(np.asarray(run(v[i : i + batch])))
        return np.concatenate(outs, axis=0)

    return embed
