"""Minimal, numerically-faithful stand-in for ``timm.models.vision_transformer``
(timm is not installed in this environment) so the read-only torch reference
can be instantiated for golden-parity tests.

Implements exactly the eval-mode math of timm's ViT ``Block`` as configured by
the reference (mar_con_unified.py:203-250: qkv_bias=True, no qk-norm, no
LayerScale, no drop-path): pre-norm fused-qkv scaled-dot-product attention and
a pre-norm GELU MLP, with timm's state-dict key names (norm1, attn.qkv,
attn.proj, norm2, mlp.fc1, mlp.fc2) so weight importers see real checkpoints'
layout. Test-only code; never imported by the framework itself.
"""

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                 proj_drop=0.0):
        super().__init__()
        assert dim % num_heads == 0
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, self.head_dim)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        x = F.scaled_dot_product_attention(
            q, k, v, dropout_p=self.attn_drop.p if self.training else 0.0
        )
        x = x.transpose(1, 2).reshape(B, N, C)
        return self.proj_drop(self.proj(x))


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features, act_layer=nn.GELU,
                 drop=0.0):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop)
        self.fc2 = nn.Linear(hidden_features, in_features)
        self.drop2 = nn.Dropout(drop)

    def forward(self, x):
        return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 qk_norm=False, proj_drop=0.0, attn_drop=0.0, init_values=None,
                 drop_path=0.0, act_layer=nn.GELU, norm_layer=nn.LayerNorm,
                 mlp_layer=None):
        super().__init__()
        # The reference never enables these; guard rather than silently differ.
        assert not qk_norm and init_values is None and drop_path == 0.0
        self.norm1 = norm_layer(dim)
        self.attn = Attention(
            dim, num_heads, qkv_bias=qkv_bias, attn_drop=attn_drop,
            proj_drop=proj_drop,
        )
        self.norm2 = norm_layer(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), act_layer=act_layer,
                       drop=proj_drop)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


def install():
    """Register the stub as ``timm`` in sys.modules (no-op if timm exists)."""
    if "timm.models.vision_transformer" in sys.modules:
        return
    try:
        import timm.models.vision_transformer  # noqa: F401
        return  # real timm available
    except ImportError:
        pass
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.Block, vit.Attention, vit.Mlp = Block, Attention, Mlp
    timm.models, models.vision_transformer = models, vit
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vit
