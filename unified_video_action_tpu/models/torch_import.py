"""Converters from PyTorch state dicts to this framework's flax param pytrees.

The reference ships all pretrained artifacts (kl16.ckpt VAE, MAR-B, task
checkpoints) as torch state dicts (SURVEY.md §2.11). These converters let a user
of the reference bring their checkpoints across. Tensors arrive as numpy arrays
(callers do ``{k: v.numpy() for k, v in sd.items()}``) — torch itself is never
imported here.

Conventions:
* torch ``nn.Linear.weight`` (out,in)  -> flax Dense ``kernel`` (in,out)
* torch ``nn.Conv2d.weight`` (O,I,H,W) -> flax Conv ``kernel`` (H,W,I,O)
* torch norm ``weight``/``bias``       -> flax ``scale``/``bias``
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional

import numpy as np


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_NORM_LEAVES = {"weight": "scale", "bias": "bias"}


def assign_module(
    tree: dict,
    flax_path: tuple,
    torch_prefix: str,
    sd: Mapping[str, np.ndarray],
    kind: str,
) -> None:
    """Copy one torch leaf module (linear / conv / norm) into the param tree."""
    w = sd.get(torch_prefix + ".weight")
    b = sd.get(torch_prefix + ".bias")
    if kind == "linear":
        if w is not None:
            _set(tree, flax_path + ("kernel",), linear_kernel(w))
        if b is not None:
            _set(tree, flax_path + ("bias",), b)
    elif kind == "conv":
        if w is not None:
            if w.ndim == 4 and w.shape[2] == 1 and w.shape[3] == 1:
                # 1x1 convs are implemented as Dense on the flax side
                _set(tree, flax_path + ("kernel",), linear_kernel(w[:, :, 0, 0]))
            else:
                _set(tree, flax_path + ("kernel",), conv_kernel(w))
        if b is not None:
            _set(tree, flax_path + ("bias",), b)
    elif kind == "norm":
        if w is not None:
            _set(tree, flax_path + ("scale",), w)
        if b is not None:
            _set(tree, flax_path + ("bias",), b)
    elif kind == "raw":
        if w is not None:
            _set(tree, flax_path, w)
    else:
        raise ValueError(kind)


def assign_param(tree: dict, flax_path: tuple, torch_key: str, sd, squeeze_leading=False):
    v = sd[torch_key]
    if squeeze_leading:
        v = np.squeeze(v, axis=0)
    _set(tree, flax_path, v)


# ---------------------------------------------------------------------------
# MlpDenoiser (reference SimpleMLPAdaLN, diffusion_loss.py:192-259)
# ---------------------------------------------------------------------------


def import_mlp_denoiser(sd: Mapping[str, np.ndarray], depth: int, prefix: str = "") -> dict:
    """Convert a SimpleMLPAdaLN state dict (optionally under ``prefix``)."""
    p = prefix
    tree: dict = {}
    assign_module(tree, ("input_proj",), p + "input_proj", sd, "linear")
    assign_module(tree, ("cond_embed",), p + "cond_embed", sd, "linear")
    assign_module(tree, ("time_embed", "fc1"), p + "time_embed.mlp.0", sd, "linear")
    assign_module(tree, ("time_embed", "fc2"), p + "time_embed.mlp.2", sd, "linear")
    for i in range(depth):
        rb = f"{p}res_blocks.{i}."
        assign_module(tree, (f"block_{i}", "ln"), rb + "in_ln", sd, "norm")
        assign_module(tree, (f"block_{i}", "fc1"), rb + "mlp.0", sd, "linear")
        assign_module(tree, (f"block_{i}", "fc2"), rb + "mlp.2", sd, "linear")
        assign_module(tree, (f"block_{i}", "ada_mod"), rb + "adaLN_modulation.1", sd, "linear")
    assign_module(tree, ("final", "ada_mod"), p + "final_layer.adaLN_modulation.1", sd, "linear")
    assign_module(tree, ("final", "proj"), p + "final_layer.linear", sd, "linear")
    return tree


# ---------------------------------------------------------------------------
# KL-VAE (reference vaekl.py)
# ---------------------------------------------------------------------------


def _import_resnet_block(tree, path, tp, sd):
    assign_module(tree, path + ("norm1",), tp + ".norm1", sd, "norm")
    assign_module(tree, path + ("conv1",), tp + ".conv1", sd, "conv")
    assign_module(tree, path + ("norm2",), tp + ".norm2", sd, "norm")
    assign_module(tree, path + ("conv2",), tp + ".conv2", sd, "conv")
    if tp + ".nin_shortcut.weight" in sd:
        assign_module(tree, path + ("shortcut",), tp + ".nin_shortcut", sd, "conv")


def _import_attn_block(tree, path, tp, sd):
    assign_module(tree, path + ("norm",), tp + ".norm", sd, "norm")
    for name in ("q", "k", "v"):
        assign_module(tree, path + (name,), tp + f".{name}", sd, "conv")
    assign_module(tree, path + ("proj_out",), tp + ".proj_out", sd, "conv")


def import_kl_vae(
    sd: Mapping[str, np.ndarray],
    ch_mult=(1, 1, 2, 2, 4),
    num_res_blocks: int = 2,
    resolution: int = 256,
    attn_resolutions=(16,),
) -> dict:
    """Convert an AutoencoderKL state dict (keys: encoder.*, decoder.*,
    quant_conv.*, post_quant_conv.*) into the flax KLVae param tree."""
    tree: dict = {}
    n_levels = len(ch_mult)

    # encoder
    assign_module(tree, ("encoder", "conv_in"), "encoder.conv_in", sd, "conv")
    curr_res = resolution
    for i in range(n_levels):
        for j in range(num_res_blocks):
            _import_resnet_block(
                tree, ("encoder", f"down_{i}_block_{j}"), f"encoder.down.{i}.block.{j}", sd
            )
            if curr_res in attn_resolutions:
                _import_attn_block(
                    tree, ("encoder", f"down_{i}_attn_{j}"), f"encoder.down.{i}.attn.{j}", sd
                )
        if i != n_levels - 1:
            assign_module(
                tree,
                ("encoder", f"down_{i}_downsample", "conv"),
                f"encoder.down.{i}.downsample.conv",
                sd,
                "conv",
            )
            curr_res //= 2
    _import_resnet_block(tree, ("encoder", "mid_block_1"), "encoder.mid.block_1", sd)
    _import_attn_block(tree, ("encoder", "mid_attn_1"), "encoder.mid.attn_1", sd)
    _import_resnet_block(tree, ("encoder", "mid_block_2"), "encoder.mid.block_2", sd)
    assign_module(tree, ("encoder", "norm_out"), "encoder.norm_out", sd, "norm")
    assign_module(tree, ("encoder", "conv_out"), "encoder.conv_out", sd, "conv")

    # decoder (note: reference decoder has attn_resolutions=() — no per-level attn)
    assign_module(tree, ("decoder", "conv_in"), "decoder.conv_in", sd, "conv")
    _import_resnet_block(tree, ("decoder", "mid_block_1"), "decoder.mid.block_1", sd)
    _import_attn_block(tree, ("decoder", "mid_attn_1"), "decoder.mid.attn_1", sd)
    _import_resnet_block(tree, ("decoder", "mid_block_2"), "decoder.mid.block_2", sd)
    for i in range(n_levels):
        for j in range(num_res_blocks + 1):
            _import_resnet_block(
                tree, ("decoder", f"up_{i}_block_{j}"), f"decoder.up.{i}.block.{j}", sd
            )
        if i != 0:
            assign_module(
                tree,
                ("decoder", f"up_{i}_upsample", "conv"),
                f"decoder.up.{i}.upsample.conv",
                sd,
                "conv",
            )
    assign_module(tree, ("decoder", "norm_out"), "decoder.norm_out", sd, "norm")
    assign_module(tree, ("decoder", "conv_out"), "decoder.conv_out", sd, "conv")

    assign_module(tree, ("quant_conv",), "quant_conv", sd, "conv")
    assign_module(tree, ("post_quant_conv",), "post_quant_conv", sd, "conv")
    return tree


# ---------------------------------------------------------------------------
# MAR unified transformer (reference mar_con_unified.py)
# ---------------------------------------------------------------------------


def _import_vit_blocks(tree, flax_prefix, torch_prefix, depth, sd):
    for i in range(depth):
        tb = f"{torch_prefix}.{i}."
        fp = flax_prefix + (f"block_{i}",)
        assign_module(tree, fp + ("norm1",), tb + "norm1", sd, "norm")
        assign_module(tree, fp + ("attn", "qkv"), tb + "attn.qkv", sd, "linear")
        assign_module(tree, fp + ("attn", "proj"), tb + "attn.proj", sd, "linear")
        assign_module(tree, fp + ("norm2",), tb + "norm2", sd, "norm")
        assign_module(tree, fp + ("mlp_fc1",), tb + "mlp.fc1", sd, "linear")
        assign_module(tree, fp + ("mlp_fc2",), tb + "mlp.fc2", sd, "linear")


def _import_action_head(tree, flax_prefix, torch_prefix, depth, sd):
    """DiffActLoss -> ActionDiffusionHead (all four pooling variants)."""
    p = torch_prefix
    if p + "conv.0.weight" in sd and p + "fc.0.weight" in sd:  # conv_fc
        assign_module(tree, flax_prefix + ("pool", "conv"), p + "conv.0", sd, "conv")
        assign_module(tree, flax_prefix + ("pool", "fc1"), p + "fc.0", sd, "linear")
        assign_module(tree, flax_prefix + ("pool", "fc2"), p + "fc.2", sd, "linear")
        assign_module(tree, flax_prefix + ("pool", "interpolate"), p + "interpolate", sd, "linear")
        assign_module(tree, flax_prefix + ("pool", "refine1"), p + "refine.0", sd, "linear")
        assign_module(tree, flax_prefix + ("pool", "refine2"), p + "refine.2", sd, "linear")
    elif p + "conv_transpose3d.weight" in sd:  # conv_ori
        w = sd[p + "conv_transpose3d.weight"]  # torch (in, out, kT, kH, kW)
        _set(tree, flax_prefix + ("pool", "conv_transpose3d", "kernel"),
             np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1))))
        if p + "conv_transpose3d.bias" in sd:
            _set(tree, flax_prefix + ("pool", "conv_transpose3d", "bias"),
                 sd[p + "conv_transpose3d.bias"])
    elif p + "conv.0.weight" in sd:  # conv2: Conv1d weights (out, in, k)
        for ti, fname in (("conv.0", "conv1"), ("conv.2", "conv2")):
            w = sd[p + ti + ".weight"]
            _set(tree, flax_prefix + ("pool", fname, "kernel"),
                 np.ascontiguousarray(np.transpose(w, (2, 1, 0))))
            if p + ti + ".bias" in sd:
                _set(tree, flax_prefix + ("pool", fname, "bias"), sd[p + ti + ".bias"])
    elif p + "fc.0.weight" in sd:  # fc2
        assign_module(tree, flax_prefix + ("pool", "fc1"), p + "fc.0", sd, "linear")
        assign_module(tree, flax_prefix + ("pool", "fc2"), p + "fc.2", sd, "linear")
    sub = import_mlp_denoiser(sd, depth, prefix=p + "net.")
    _set(tree, flax_prefix + ("net",), sub)


def import_mar(
    sd: Mapping[str, np.ndarray],
    encoder_depth: int = 12,
    decoder_depth: int = 12,
    diffloss_depth: int = 6,
    diffloss_act_depth: int = 6,
) -> dict:
    """Convert a reference MAR state dict into the flax Mar param tree.

    Handles partial dicts (e.g. MAR-B pretrained without action head): only
    keys present in ``sd`` are emitted; callers merge over their init tree.
    """
    tree: dict = {}
    has = lambda k: (k + ".weight") in sd or k in sd

    for name in (
        "z_proj_cond", "z_proj", "z_proj_wrist", "action_proj_cond",
        "history_action_proj_cond",
        "proprioception_proj_cond", "proprioception_image_proj_cond",
        "text_proj_cond", "proj_cond_x_layer", "decoder_embed",
    ):
        if has(name):
            assign_module(tree, (name,), name, sd, "linear")
    for name in ("z_proj_ln", "encoder_norm", "decoder_norm"):
        if has(name):
            assign_module(tree, (name,), name, sd, "norm")
    for name in (
        "fake_latent_x", "fake_action_latent", "fake_latent",
        "fake_latent_history_action", "fake_latent_wrist_x",
        "temporal_pos_embed", "spatial_pos_embed",
        "decoder_temporal_pos_embed", "decoder_spatial_pos_embed",
        "diffusion_temporal_embed", "diffusion_spatial_embed",
        "text_pos_embed", "decoder_text_pos_embed",
    ):
        if name in sd:
            _set(tree, (name,), sd[name])

    if any(k.startswith("encoder_blocks.") for k in sd):
        _import_vit_blocks(tree, ("encoder_blocks",), "encoder_blocks", encoder_depth, sd)
    if any(k.startswith("decoder_blocks.") for k in sd):
        _import_vit_blocks(tree, ("decoder_blocks",), "decoder_blocks", decoder_depth, sd)

    if "diffloss.net.input_proj.weight" in sd:
        sub = import_mlp_denoiser(sd, diffloss_depth, prefix="diffloss.net.")
        _set(tree, ("diffloss", "net"), sub)
    if "diffloss_wrist.net.input_proj.weight" in sd:
        sub = import_mlp_denoiser(sd, diffloss_depth, prefix="diffloss_wrist.net.")
        _set(tree, ("diffloss_wrist", "net"), sub)
    if "diffactloss.net.input_proj.weight" in sd:
        _import_action_head(tree, ("diffactloss",), "diffactloss.", diffloss_act_depth, sd)
    if "diffproploss.net.input_proj.weight" in sd:
        _import_action_head(tree, ("diffproploss",), "diffproploss.", diffloss_act_depth, sd)
    return tree


def merge_params(init_tree: dict, imported: dict) -> dict:
    """Overlay imported leaves onto an init tree (size-matched partial load,
    mirroring the reference's load_pretrained_model semantics
    (unified_video_action_policy.py:140-218)). Returns (merged, skipped_paths)."""
    skipped = []

    def rec(dst, src, path):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                skipped.append("/".join(path + (k,)) + " (unexpected)")
                continue
            if isinstance(v, dict):
                out[k] = rec(dst[k], v, path + (k,))
            else:
                if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    skipped.append(
                        "/".join(path + (k,))
                        + f" (shape {np.shape(v)} vs {np.shape(dst[k])})"
                    )
                else:
                    out[k] = v
        return out

    merged = rec(init_tree, imported, ())
    return merged, skipped


# ---------------------------------------------------------------------------
# Tolerant torch checkpoint loading
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str):
    """torch.load a reference checkpoint even when its pickled config graph
    references packages that aren't installed here (omegaconf, hydra, dill
    payloads — workspace/base_workspace.py:33-77 stores the resolved cfg inside
    the checkpoint). Missing classes unpickle as inert stubs; the tensors in
    state_dicts are unaffected."""
    import importlib
    import io
    import pickle

    import torch

    class _Stub:
        def __init__(self, *a, **k):
            self.__dict__["_args"] = (a, k)

        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)

        def __getattr__(self, name):
            raise AttributeError(name)

    class _TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                mod = importlib.import_module(module)
                return getattr(mod, name)
            except Exception:
                stub = type(f"{module}.{name}", (_Stub,), {})
                return stub

    class _PickleModule:
        Unpickler = _TolerantUnpickler

        @staticmethod
        def load(f, **kw):
            return _TolerantUnpickler(f).load()

        @staticmethod
        def loads(s, **kw):
            return _TolerantUnpickler(io.BytesIO(s)).load()

    return torch.load(
        path, map_location="cpu", weights_only=False, pickle_module=_PickleModule
    )


# ---------------------------------------------------------------------------
# CLIP text tower (reference: HF CLIPTextModelWithProjection used frozen,
# utils/language_model.py:7-33) -> models/clip.ClipTextModel
# ---------------------------------------------------------------------------


def import_clip_text(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """HF CLIPTextModelWithProjection state dict -> flax ClipTextModel params."""
    tree: dict = {}
    emb = "text_model.embeddings."
    _set(tree, ("token_embedding",), sd[emb + "token_embedding.weight"])
    _set(tree, ("position_embedding",), sd[emb + "position_embedding.weight"])
    for i in range(num_layers):
        tp = f"text_model.encoder.layers.{i}."
        fp = (f"layer_{i}",)
        assign_module(tree, fp + ("layer_norm1",), tp + "layer_norm1", sd, "norm")
        assign_module(tree, fp + ("layer_norm2",), tp + "layer_norm2", sd, "norm")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            assign_module(
                tree, fp + ("self_attn", proj), tp + f"self_attn.{proj}", sd,
                "linear",
            )
        assign_module(tree, fp + ("fc1",), tp + "mlp.fc1", sd, "linear")
        assign_module(tree, fp + ("fc2",), tp + "mlp.fc2", sd, "linear")
    assign_module(
        tree, ("final_layer_norm",), "text_model.final_layer_norm", sd, "norm"
    )
    # HF text_projection is a bias-free Linear (out, in); flax side is a raw
    # (in, out) matrix
    _set(tree, ("text_projection",), linear_kernel(sd["text_projection.weight"]))
    return tree
