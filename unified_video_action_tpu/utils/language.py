"""Language conditioning: CLIP text features with an offline fallback.

Equivalent of the reference's CLIP factory (utils/language_model.py:7-33):
``openai/clip-vit-base-patch32`` text tower, max_length 30 (77 for libero),
512-d pooled features. When the HF weights are not available locally (this
environment has no network egress), a deterministic hash-based encoder stands
in so language-conditioned code paths stay testable; the API is identical.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Sequence, Union

# never hit the network for tokenizers/weights (zero-egress environments hang)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np

CLIP_DIM = 512


class HashTextEncoder:
    """Deterministic stand-in for CLIP text features (offline/testing).

    Maps each string to a fixed unit-norm 512-d vector derived from its
    sha256 — stable across processes, no learned weights.
    """

    dim = CLIP_DIM

    def encode(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim).astype(np.float32)
            out[i] = v / np.linalg.norm(v)
        return out


class ClipTextEncoder:
    """CLIP text tower run in JAX (models/clip.ClipTextModel), frozen.

    The HF torch checkpoint is read ONCE at construction and imported into
    the flax tower (torch_import.import_clip_text, parity-tested) so goal
    encoding runs on-device with the rest of the policy; only tokenization
    stays host-side (transformers' BPE tokenizer)."""

    dim = CLIP_DIM

    def __init__(self, model_name: str = "openai/clip-vit-base-patch32",
                 max_length: int = 30):
        import jax
        import jax.numpy as jnp
        from transformers import CLIPTokenizer, CLIPTextModelWithProjection

        from unified_video_action_tpu.models import torch_import
        from unified_video_action_tpu.models.clip import (
            ClipTextConfig,
            ClipTextModel,
        )

        # local_files_only: offline env vars are read by transformers at its
        # import time, which may precede this module's guard — force it per
        # call so zero-egress hosts fail fast to the hash fallback
        self.tokenizer = CLIPTokenizer.from_pretrained(
            model_name, local_files_only=True
        )
        tm = CLIPTextModelWithProjection.from_pretrained(
            model_name, local_files_only=True
        ).eval()
        hf = tm.config
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        del tm
        cfg = ClipTextConfig(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            max_position_embeddings=hf.max_position_embeddings,
            projection_dim=hf.projection_dim,
            eos_token_id=hf.eos_token_id,
        )
        self._params = jax.tree.map(
            jnp.asarray,
            torch_import.import_clip_text(sd, cfg.num_layers),
        )
        self._model = ClipTextModel(cfg)
        # params are a traced ARGUMENT, not a closure: closing over them
        # would bake the ~250 MB weight tree into the executable as constants
        # (a second copy + slow constant-folding at trace time)
        self._apply = jax.jit(
            lambda params, ids: self._model.apply({"params": params}, ids)
        )
        self.max_length = max_length

    def encode(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        tokens = self.tokenizer(
            list(texts), padding="max_length", max_length=self.max_length,
            truncation=True, return_tensors="np",
        )
        ids = tokens["input_ids"].astype(np.int32)
        return np.asarray(self._apply(self._params, ids)).astype(np.float32)


def get_text_encoder(
    task_name: Optional[str], language_emb_model: Optional[str]
):
    """Returns (encoder, max_length) or (None, None) when no language model is
    configured (pusht et al.)."""
    if language_emb_model is None:
        return None, None
    assert language_emb_model == "clip", language_emb_model
    max_length = 77 if (task_name and "libero" in task_name) else 30
    try:
        return ClipTextEncoder(max_length=max_length), max_length
    except Exception:
        # no local HF weights (offline) -> deterministic fallback
        return HashTextEncoder(), max_length
