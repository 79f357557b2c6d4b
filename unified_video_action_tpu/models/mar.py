"""MAR unified video-action transformer, TPU-native.

Behavioral equivalent of the reference's ``MAR`` (mar_con_unified.py:28-1234):
one masked-autoregressive ViT encoder/decoder over 4 frames × 256 VAE-latent
tokens plus 64 text-buffer tokens, with per-modality channel-concat fusion
(target frames ‖ cond frames ‖ action latents [‖ history actions ‖
proprioception]), factorized temporal+spatial learned position embeddings, and
two per-token diffusion heads (video DiffLoss + action DiffActLoss).

TPU-first re-design (not a port):
* No data-dependent shapes anywhere. The reference masks via boolean fancy
  indexing and ``nonzero`` (mar_con_unified.py:489,1090); here masking is dense
  ``where`` selects, and the truncated-normal mask *ratio* becomes a per-sample
  rank threshold: rank(u) < ceil(S·ratio) with static shapes.
* Task modes are static Python branches — each mode jits to its own lean XLA
  program (the policy picks the mode per batch on host, as the reference does
  with ``random.choice``).
* The MaskGIT sampling loop runs a static ``num_iter`` with dense token
  prediction and ``where`` blending; the policy/inverse path is a single
  encoder+decoder pass feeding the scan-based action sampler.
* All RNG is explicit (mask ratio, order permutation, CFG text-drop, diffusion
  t/noise keys).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unified_video_action_tpu.models.heads import (
    ActionDiffusionHead,
    VideoDiffusionHead,
)
from unified_video_action_tpu.models.transformer import TransformerStack

Array = jax.Array

TASK_MODES = (
    "video_model",
    "dynamic_model",
    "policy_model",
    "inverse_model",
    "full_dynamic_model",
)


@dataclasses.dataclass(frozen=True)
class MarConfig:
    # geometry
    img_size: int = 256
    vae_stride: int = 16
    patch_size: int = 1
    vae_embed_dim: int = 16
    n_frames: int = 4
    # transformer
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    decoder_embed_dim: int = 768
    decoder_depth: int = 12
    decoder_num_heads: int = 12
    mlp_ratio: float = 4.0
    attn_dropout: float = 0.1
    proj_dropout: float = 0.1
    # masking / cfg
    mask_ratio_min: float = 0.7
    label_drop_prob: float = 0.1
    # heads
    diffloss_d: int = 6
    diffloss_w: int = 1024
    diffloss_act_d: int = 6
    diffloss_act_w: int = 1024
    num_sampling_steps: str = "100"
    act_diff_training_steps: int = 1000
    act_diff_testing_steps: str = "100"
    act_model_type: str = "conv_fc"
    predict_video: bool = True
    predict_action: bool = True
    # modalities
    action_dim: int = 2
    num_action_tokens: int = 16
    buffer_size_text: int = 64
    buffer_size_action: int = 64
    use_proprioception: bool = False
    use_history_action: bool = False
    action_mask_ratio: float = 0.5
    different_history_freq: bool = False
    predict_wrist_img: bool = False
    predict_proprioception: bool = False
    proprio_dim: int = 0            # width of the concatenated proprio state vector
    proprio_pred_dim: int = 0       # target width for the proprio prediction head
    proprio_use_image: bool = False  # robomimic-style second-image conditioning
    task_name: str = "pusht"
    language_emb_model: Optional[str] = None
    # compute
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    quant: bool = False  # int8 W8A8 encoder/decoder dense layers (serving)
    grad_checkpointing: bool = False

    @property
    def seq_hw(self) -> int:
        return self.img_size // self.vae_stride // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.seq_hw * self.seq_hw

    @property
    def token_embed_dim(self) -> int:
        return self.vae_embed_dim * self.patch_size**2

    @property
    def total_tokens(self) -> int:
        return self.n_frames * self.seq_len

    @property
    def buffer_size_proprio(self) -> int:
        return 64 * 4 if self.different_history_freq else 64


MODEL_SIZES = {
    "mar_tiny": dict(encoder_embed_dim=768, encoder_depth=3, encoder_num_heads=6,
                     decoder_embed_dim=768, decoder_depth=3, decoder_num_heads=6),
    "mar_small": dict(encoder_embed_dim=768, encoder_depth=6, encoder_num_heads=6,
                      decoder_embed_dim=768, decoder_depth=6, decoder_num_heads=6),
    "mar_base": dict(encoder_embed_dim=768, encoder_depth=12, encoder_num_heads=12,
                     decoder_embed_dim=768, decoder_depth=12, decoder_num_heads=12),
    "mar_large": dict(encoder_embed_dim=1024, encoder_depth=16, encoder_num_heads=16,
                      decoder_embed_dim=1024, decoder_depth=16, decoder_num_heads=16),
    "mar_huge": dict(encoder_embed_dim=1280, encoder_depth=20, encoder_num_heads=16,
                     decoder_embed_dim=1280, decoder_depth=20, decoder_num_heads=16),
}


def patchify(x: Array, patch_size: int) -> Array:
    """(B, C, H, W) -> (B, L, C·p²), matching the reference layout
    (mar_con_unified.py:393-401)."""
    B, C, H, W = x.shape
    p = patch_size
    if p == 1:
        return jnp.transpose(x, (0, 2, 3, 1)).reshape(B, H * W, C)
    h, w = H // p, W // p
    x = x.reshape(B, C, h, p, w, p)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(B, h * w, C * p * p)


def unpatchify(x: Array, patch_size: int, vae_embed_dim: int, seq_hw: int) -> Array:
    B = x.shape[0]
    p, c, hw = patch_size, vae_embed_dim, seq_hw
    if p == 1:
        return jnp.transpose(x.reshape(B, hw, hw, c), (0, 3, 1, 2))
    x = x.reshape(B, hw, hw, c, p, p)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
    return x.reshape(B, c, hw * p, hw * p)


def sample_mask_rate(key: Array, mask_ratio_min: float) -> Array:
    """Left-truncated gaussian centered at 1.0 with std 0.25 on
    [mask_ratio_min, 1.0] (mar_con_unified.py:85-88)."""
    lower = (mask_ratio_min - 1.0) / 0.25
    z = jax.random.truncated_normal(key, lower, 0.0)
    return z * 0.25 + 1.0


def random_spatial_mask(
    key: Array, bsz: int, seq_len: int, mask_rate: Array
) -> Array:
    """Per-sample random mask with ceil(seq_len·rate) masked positions,
    shared across frames. Dense rank-threshold construction (static shapes)."""
    u = jax.random.uniform(key, (bsz, seq_len))
    rank = jnp.argsort(jnp.argsort(u, axis=-1), axis=-1)  # 0..S-1 per sample
    num_masked = jnp.ceil(seq_len * mask_rate).astype(jnp.int32)
    return (rank < num_masked).astype(jnp.float32)


def sample_orders(key: Array, bsz: int, seq_len: int) -> Array:
    """Random generation orders as ranks: rank[i, s] = position of token s in
    the order. mask_by_order(L) == rank < L."""
    u = jax.random.uniform(key, (bsz, seq_len))
    return jnp.argsort(jnp.argsort(u, axis=-1), axis=-1)


class Mar(nn.Module):
    cfg: MarConfig

    def setup(self):
        c = self.cfg
        D = c.encoder_embed_dim
        dense = lambda d, name: nn.Dense(
            d, dtype=c.dtype, kernel_init=nn.initializers.xavier_uniform(), name=name
        )
        self.z_proj_cond = dense(D, "z_proj_cond")
        self.z_proj = dense(D, "z_proj")
        self.action_proj_cond = dense(D, "action_proj_cond")
        self.proj_cond_x_layer = dense(D, "proj_cond_x_layer")
        self.z_proj_ln = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="z_proj_ln")

        init02 = nn.initializers.normal(0.02)
        self.fake_latent_x = self.param("fake_latent_x", init02, (1, D))
        self.fake_action_latent = self.param("fake_action_latent", init02, (1, D))

        if c.predict_wrist_img:
            self.z_proj_wrist = dense(D, "z_proj_wrist")
            self.fake_latent_wrist_x = self.param(
                "fake_latent_wrist_x", init02, (1, D)
            )

        if c.use_history_action:
            self.history_action_proj_cond = dense(D, "history_action_proj_cond")
            self.fake_latent_history_action = self.param(
                "fake_latent_history_action", init02, (1, D)
            )

        if c.use_proprioception:
            self.proprioception_proj_cond = dense(D, "proprioception_proj_cond")
            # created unconditionally to match the reference's checkpoint
            # surface (mar_con_unified.py:143-145 builds it even for umi,
            # where it is never used in forward)
            self.proprioception_image_proj_cond = dense(
                D, "proprioception_image_proj_cond"
            )

        if c.language_emb_model == "clip":
            self.fake_latent = self.param("fake_latent", init02, (1, D))
            self.text_proj_cond = dense(D, "text_proj_cond")
            self.text_pos_embed = self.param(
                "text_pos_embed", init02, (1, c.buffer_size_text, D)
            )
            self.decoder_text_pos_embed = self.param(
                "decoder_text_pos_embed", init02, (1, c.buffer_size_text, c.decoder_embed_dim)
            )

        self.temporal_pos_embed = self.param(
            "temporal_pos_embed", init02, (1, c.n_frames, D)
        )
        self.spatial_pos_embed = self.param(
            "spatial_pos_embed", init02, (1, c.seq_len, D)
        )
        self.decoder_temporal_pos_embed = self.param(
            "decoder_temporal_pos_embed", init02, (1, c.n_frames, c.decoder_embed_dim)
        )
        self.decoder_spatial_pos_embed = self.param(
            "decoder_spatial_pos_embed", init02, (1, c.seq_len, c.decoder_embed_dim)
        )
        self.diffusion_temporal_embed = self.param(
            "diffusion_temporal_embed", init02, (1, c.n_frames, c.decoder_embed_dim)
        )
        self.diffusion_spatial_embed = self.param(
            "diffusion_spatial_embed", init02, (1, c.seq_len, c.decoder_embed_dim)
        )

        stack = lambda depth, dim, heads, name: TransformerStack(
            depth=depth,
            dim=dim,
            num_heads=heads,
            mlp_ratio=c.mlp_ratio,
            attn_dropout=c.attn_dropout,
            proj_dropout=c.proj_dropout,
            dtype=c.dtype,
            attn_impl=c.attn_impl,
            quant=c.quant,
            remat=c.grad_checkpointing,
            name=name,
        )
        self.encoder_blocks = stack(
            c.encoder_depth, D, c.encoder_num_heads, "encoder_blocks"
        )
        self.encoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="encoder_norm")
        self.decoder_embed = dense(c.decoder_embed_dim, "decoder_embed")
        self.decoder_blocks = stack(
            c.decoder_depth, c.decoder_embed_dim, c.decoder_num_heads, "decoder_blocks"
        )
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="decoder_norm")

        if c.predict_video:
            self.diffloss = VideoDiffusionHead(
                target_channels=c.token_embed_dim,
                z_channels=c.decoder_embed_dim,
                width=c.diffloss_w,
                depth=c.diffloss_d,
                num_sampling_steps=c.num_sampling_steps,
                dtype=c.dtype,
                quant=c.quant,
                name="diffloss",
            )
            if c.predict_wrist_img:
                self.diffloss_wrist = VideoDiffusionHead(
                    target_channels=c.token_embed_dim,
                    z_channels=c.decoder_embed_dim,
                    width=c.diffloss_w,
                    depth=c.diffloss_d,
                    num_sampling_steps=c.num_sampling_steps,
                    dtype=c.dtype,
                    name="diffloss_wrist",
                )
        if c.predict_action:
            self.diffactloss = ActionDiffusionHead(
                target_channels=c.action_dim,
                z_channels=c.decoder_embed_dim,
                width=c.diffloss_act_w,
                depth=c.diffloss_act_d,
                n_frames=c.n_frames,
                num_actions=c.num_action_tokens,
                act_diff_training_steps=c.act_diff_training_steps,
                act_diff_testing_steps=c.act_diff_testing_steps,
                act_model_type=c.act_model_type,
                dtype=c.dtype,
                quant=c.quant,
                name="diffactloss",
            )
        if c.predict_proprioception:
            self.diffproploss = ActionDiffusionHead(
                target_channels=c.proprio_pred_dim,
                z_channels=c.decoder_embed_dim,
                width=c.diffloss_act_w,
                depth=c.diffloss_act_d,
                n_frames=c.n_frames,
                num_actions=c.num_action_tokens,
                act_diff_training_steps=c.act_diff_training_steps,
                act_diff_testing_steps=c.act_diff_testing_steps,
                act_model_type=c.act_model_type,
                dtype=c.dtype,
                quant=c.quant,
                name="diffproploss",
            )

    # ------------------------------------------------------------------
    # encoder / decoder
    # ------------------------------------------------------------------

    def forward_encoder(
        self,
        x_tokens: Array,             # (B, T, S, C_tok) target-frame tokens
        mask: Array,                 # (B, T, S) 1 = masked
        cond_tokens: Array,          # (B, T, S, C_tok) conditioning-frame tokens
        task_mode: str,
        text_latents: Optional[Array] = None,    # (B, D) already projected
        history_actions: Optional[Array] = None,  # (B, 16, act_dim)
        actions: Optional[Array] = None,          # (B, 16, act_dim)
        proprio: Optional[Dict[str, Array]] = None,
        train: bool = False,
        rngs_key: Optional[Array] = None,
    ) -> Array:
        c = self.cfg
        B, T, S, _ = cond_tokens.shape
        L = T * S
        flat_mask = mask.reshape(B, L)

        # --- modality streams (each (B, L, D)) ---
        wrist_x = None
        if task_mode == "policy_model":
            cond = self.z_proj_cond(cond_tokens).reshape(B, L, -1)
            x = jnp.broadcast_to(self.fake_latent_x[None], (B, L, cond.shape[-1]))
            x = x.astype(cond.dtype)
            if c.predict_wrist_img:
                wrist_x = jnp.broadcast_to(
                    self.fake_latent_wrist_x[None], (B, L, cond.shape[-1])
                ).astype(cond.dtype)
        elif task_mode == "inverse_model":
            x = self.z_proj(x_tokens).reshape(B, L, -1)
            cond = jnp.broadcast_to(self.fake_latent_x[None], (B, L, x.shape[-1]))
            cond = cond.astype(x.dtype)
            if c.predict_wrist_img:
                wrist_x = self.z_proj_wrist(
                    proprio["pred_second_image_tokens"]
                ).reshape(B, L, -1)
        else:
            cond = self.z_proj_cond(cond_tokens).reshape(B, L, -1)
            x = self.z_proj(x_tokens).reshape(B, L, -1)
            fake = self.fake_latent_x[None].astype(x.dtype)
            x = jnp.where(flat_mask[..., None] == 1.0, fake, x)
            if c.predict_wrist_img:
                wrist_x = self.z_proj_wrist(
                    proprio["pred_second_image_tokens"]
                ).reshape(B, L, -1)
                fake_w = self.fake_latent_wrist_x[None].astype(wrist_x.dtype)
                wrist_x = jnp.where(flat_mask[..., None] == 1.0, fake_w, wrist_x)

        parts = [x, wrist_x, cond] if wrist_x is not None else [x, cond]

        if c.use_history_action:
            if history_actions is None:
                hist = jnp.broadcast_to(
                    self.fake_latent_history_action[None],
                    (B, c.num_action_tokens, x.shape[-1]),
                ).astype(x.dtype)
            else:
                hist = self.history_action_proj_cond(history_actions)
                if train:
                    if rngs_key is None:
                        raise ValueError("training requires rngs_key")
                    hk = jax.random.fold_in(rngs_key, 1)
                    keep = (
                        jax.random.uniform(hk, (B, hist.shape[1]))
                        <= c.action_mask_ratio
                    )
                    hist = jnp.where(
                        keep[..., None],
                        hist,
                        self.fake_latent_history_action[None].astype(hist.dtype),
                    )
            # expand each low-rate stream so all parts align on L tokens
            # (reference repeat_interleave(buffer_size_action) with 16·64 == 1024)
            assert L % hist.shape[1] == 0, (L, hist.shape)
            hist = jnp.repeat(hist, L // hist.shape[1], axis=1)
            parts.append(hist)

        if task_mode == "dynamic_model":
            act = self.action_proj_cond(actions)
        else:
            act = jnp.broadcast_to(
                self.fake_action_latent[None], (B, c.num_action_tokens, x.shape[-1])
            ).astype(x.dtype)
        assert L % act.shape[1] == 0, (L, act.shape)
        parts.append(jnp.repeat(act, L // act.shape[1], axis=1))

        if c.use_proprioception:
            assert proprio is not None
            state = self.proprioception_proj_cond(
                proprio["state"].astype(jnp.float32)
            )
            assert L % state.shape[1] == 0, (L, state.shape)
            state = jnp.repeat(state, L // state.shape[1], axis=1)
            if c.proprio_use_image:
                img = self.proprioception_image_proj_cond(
                    proprio["second_image_tokens"]
                ).reshape(B, L, -1)
                parts.extend([img, state])
            else:
                parts.append(state)

        h = self.proj_cond_x_layer(jnp.concatenate(parts, axis=-1))

        # --- factorized position embedding ---
        pos = (
            self.temporal_pos_embed[:, :, None, :]
            + self.spatial_pos_embed[:, None, :, :]
        ).reshape(1, L, -1)
        h = h + pos.astype(h.dtype)

        # --- text buffer ---
        if c.language_emb_model == "clip":
            if text_latents is None:
                # no goal given: condition on the learned null latent — the
                # same "fake" buffer CFG label-drop trains as the
                # unconditional branch (reference mar_con_unified.py:627-642)
                txt = jnp.broadcast_to(
                    self.fake_latent[None],
                    (B, c.buffer_size_text, self.fake_latent.shape[-1]),
                ).astype(h.dtype)
            else:
                txt = jnp.repeat(
                    text_latents[:, None, :], c.buffer_size_text, axis=1
                )
                if train:
                    if rngs_key is None:
                        raise ValueError("training requires rngs_key")
                    dk = jax.random.fold_in(rngs_key, 2)
                    drop = (
                        jax.random.uniform(dk, (B,)) < c.label_drop_prob
                    )[:, None, None].astype(txt.dtype)
                    fake = jnp.broadcast_to(
                        self.fake_latent[None], txt.shape
                    ).astype(txt.dtype)
                    txt = drop * fake + (1.0 - drop) * txt
            txt = txt + self.text_pos_embed.astype(txt.dtype)
            h = jnp.concatenate([txt.astype(h.dtype), h], axis=1)

        h = self.z_proj_ln(h)
        h = self.encoder_blocks(h, deterministic=not train)
        return self.encoder_norm(h)

    def forward_decoder(self, h: Array, train: bool = False) -> Array:
        c = self.cfg
        z = self.decoder_embed(h)
        L = c.total_tokens
        pos = (
            self.decoder_temporal_pos_embed[:, :, None, :]
            + self.decoder_spatial_pos_embed[:, None, :, :]
        ).reshape(1, L, -1)
        if c.language_emb_model == "clip":
            pos = jnp.concatenate([self.decoder_text_pos_embed, pos], axis=1)
        z = z + pos.astype(z.dtype)
        z = self.decoder_blocks(z, deterministic=not train)
        z = self.decoder_norm(z)
        if c.language_emb_model == "clip":
            z = z[:, c.buffer_size_text:]
        diff_pos = (
            self.diffusion_temporal_embed[:, :, None, :]
            + self.diffusion_spatial_embed[:, None, :, :]
        ).reshape(1, L, -1)
        return z + diff_pos.astype(z.dtype)

    # ------------------------------------------------------------------
    # training forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        x_frames: Array,          # (B, T, C, H, W) target frame latents
        cond_frames: Array,       # (B, T, C, H, W) conditioning frame latents
        task_mode: str,
        key: Array,
        history_actions: Optional[Array] = None,
        actions: Optional[Array] = None,
        text_latents: Optional[Array] = None,   # raw CLIP features (B, 512)
        proprio: Optional[Dict[str, Array]] = None,
        proprio_target: Optional[Array] = None,  # (B, 16, proprio_pred_dim)
        train: bool = True,
    ) -> Tuple[Array, Array, Array]:
        """Training forward for one task mode. Returns (loss, video_loss, act_loss)."""
        c = self.cfg
        assert task_mode in TASK_MODES, task_mode
        B, T = x_frames.shape[:2]

        x_tokens = patchify(
            x_frames.reshape(B * T, *x_frames.shape[2:]), c.patch_size
        ).reshape(B, T, c.seq_len, c.token_embed_dim)
        cond_tokens = patchify(
            cond_frames.reshape(B * T, *cond_frames.shape[2:]), c.patch_size
        ).reshape(B, T, c.seq_len, c.token_embed_dim)

        if proprio is not None:
            proprio = dict(proprio)
            for k in ("second_image", "pred_second_image"):
                if k in proprio:
                    si = proprio[k]
                    proprio[k + "_tokens"] = patchify(
                        si.reshape(B * T, *si.shape[2:]), c.patch_size
                    ).reshape(B, T, c.seq_len, c.token_embed_dim)

        gt_latents = jax.lax.stop_gradient(x_tokens).reshape(
            B, c.total_tokens, c.token_embed_dim
        )
        gt_wrist_latents = None
        if c.predict_wrist_img:
            gt_wrist_latents = jax.lax.stop_gradient(
                proprio["pred_second_image_tokens"]
            ).reshape(B, c.total_tokens, c.token_embed_dim)

        if text_latents is not None and c.language_emb_model == "clip":
            text_latents = self.text_proj_cond(text_latents)

        k_rate, k_mask, k_enc, k_head = jax.random.split(key, 4)
        rate = sample_mask_rate(k_rate, c.mask_ratio_min)
        spatial_mask = random_spatial_mask(k_mask, B, c.seq_len, rate)
        mask = jnp.broadcast_to(spatial_mask[:, None, :], (B, T, c.seq_len))

        h = self.forward_encoder(
            x_tokens,
            mask,
            cond_tokens,
            task_mode,
            text_latents=text_latents,
            history_actions=history_actions,
            actions=actions,
            proprio=proprio,
            train=train,
            rngs_key=k_enc,
        )
        z = self.forward_decoder(h, train=train)

        flat_mask = mask.reshape(B, c.total_tokens)
        zero = jnp.zeros((), dtype=jnp.float32)
        video_loss, act_loss = zero, zero
        kv, ka, kp = jax.random.split(k_head, 3)

        if c.predict_video and task_mode in (
            "video_model", "dynamic_model", "full_dynamic_model"
        ):
            video_loss = self.diffloss(gt_latents, z, flat_mask, kv)
            if c.predict_wrist_img:
                video_loss = video_loss + self.diffloss_wrist(
                    gt_wrist_latents, z, flat_mask, jax.random.fold_in(kv, 1)
                )
        if c.predict_action and task_mode in (
            "policy_model", "inverse_model", "full_dynamic_model"
        ):
            act_loss = self.diffactloss(actions, z, ka)
        loss = video_loss + act_loss

        if c.predict_proprioception:
            assert proprio_target is not None
            loss = loss + self.diffproploss(proprio_target, z, kp)

        return loss, video_loss, act_loss

    def init_forward(
        self,
        x_frames: Array,
        cond_frames: Array,
        key: Array,
        actions: Array,
        text_latents: Optional[Array] = None,
        proprio: Optional[Dict[str, Array]] = None,
        proprio_target: Optional[Array] = None,
    ):
        """Initialization-only forward touching EVERY submodule (flax creates
        params lazily on first call; no single task mode uses all projections)."""
        out = self(
            x_frames,
            cond_frames,
            "full_dynamic_model",
            key,
            actions=actions,
            text_latents=text_latents,
            proprio=proprio,
            proprio_target=proprio_target,
            train=False,
        )
        extra = self.action_proj_cond(actions).sum() * 0.0
        if self.cfg.use_history_action:
            extra = extra + self.history_action_proj_cond(actions).sum() * 0.0
        if self.cfg.use_proprioception and not self.cfg.proprio_use_image:
            # unused at runtime but present in reference checkpoints
            dummy = jnp.zeros((1, self.cfg.token_embed_dim))
            extra = extra + self.proprioception_image_proj_cond(dummy).sum() * 0.0
        return out[0] + extra, out[1], out[2]

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------

    def sample_policy(
        self,
        cond_frames: Array,       # (B, T, C, H, W)
        key: Array,
        temperature: float = 1.0,
        history_actions: Optional[Array] = None,
        text_latents: Optional[Array] = None,
        proprio: Optional[Dict[str, Array]] = None,
        x_frames: Optional[Array] = None,   # for inverse_model
        task_mode: str = "policy_model",
    ) -> Array:
        """Policy/inverse fast path: ONE encoder+decoder pass -> action chunk
        (mar_con_unified.py:1037-1047). Returns (B, 16, action_dim)."""
        c = self.cfg
        B, T = cond_frames.shape[:2]
        cond_tokens = patchify(
            cond_frames.reshape(B * T, *cond_frames.shape[2:]), c.patch_size
        ).reshape(B, T, c.seq_len, c.token_embed_dim)

        if task_mode == "inverse_model":
            assert x_frames is not None
            x_tokens = patchify(
                x_frames.reshape(B * T, *x_frames.shape[2:]), c.patch_size
            ).reshape(B, T, c.seq_len, c.token_embed_dim)
            mask = jnp.zeros((B, T, c.seq_len))
        else:
            x_tokens = jnp.zeros(
                (B, T, c.seq_len, c.token_embed_dim), dtype=cond_tokens.dtype
            )
            mask = jnp.ones((B, T, c.seq_len))

        if proprio is not None and "second_image" in proprio:
            si = proprio["second_image"]
            proprio = dict(proprio)
            proprio["second_image_tokens"] = patchify(
                si.reshape(B * T, *si.shape[2:]), c.patch_size
            ).reshape(B, T, c.seq_len, c.token_embed_dim)

        if text_latents is not None and c.language_emb_model == "clip":
            text_latents = self.text_proj_cond(text_latents)

        h = self.forward_encoder(
            x_tokens,
            mask,
            cond_tokens,
            task_mode,
            text_latents=text_latents,
            history_actions=history_actions,
            proprio=proprio,
            train=False,
        )
        z = self.forward_decoder(h, train=False)
        return self.diffactloss.sample(z, key, temperature=temperature, cfg=1.0)

    def sample_video(
        self,
        cond_frames: Array,
        key: Array,
        num_iter: int = 1,
        cfg: float = 1.0,
        cfg_schedule: str = "linear",
        temperature: float = 1.0,
        task_mode: str = "full_dynamic_model",
        history_actions: Optional[Array] = None,
        actions: Optional[Array] = None,
        text_latents: Optional[Array] = None,
        proprio: Optional[Dict[str, Array]] = None,
    ) -> Tuple[Array, Optional[Array]]:
        """MaskGIT-style iterative video generation (+ action from the last pass).

        Returns (frame latents (B·T, C, h, w), action chunk or None).

        Static num_iter; each round predicts ALL tokens densely and blends only
        the newly-revealed ones — cosine schedule over rounds, per-round CFG
        scale following Muse (mar_con_unified.py:1049-1099).

        cfg != 1.0 runs batch-duplicated classifier-free guidance (MAR-style,
        mar_con_unified.py:1085-1107 + diffusion_loss.py:285-293): the
        unconditional half replaces the projected text latent with the learned
        ``fake_latent`` (the same latent training drops to), the encoder and
        decoder run on the 2B batch, and the video head blends
        eps = uncond + cfg_iter·(cond − uncond). The action head always samples
        at cfg 1 from the conditional half (reference act_cfg=1.0,
        mar_con_unified.py:1038).
        """
        c = self.cfg
        use_cfg = cfg != 1.0
        if use_cfg and (c.language_emb_model != "clip" or text_latents is None):
            raise ValueError(
                "cfg != 1.0 requires CLIP text conditioning (the only latent "
                "trained with drop), got "
                f"language_emb_model={c.language_emb_model!r}"
            )
        B, T = cond_frames.shape[:2]
        S = c.seq_len
        cond_tokens = patchify(
            cond_frames.reshape(B * T, *cond_frames.shape[2:]), c.patch_size
        ).reshape(B, T, S, c.token_embed_dim)

        if text_latents is not None and c.language_emb_model == "clip":
            text_latents = self.text_proj_cond(text_latents)

        if proprio is not None and "second_image" in proprio:
            si = proprio["second_image"]
            proprio = dict(proprio)
            proprio["second_image_tokens"] = patchify(
                si.reshape(B * T, *si.shape[2:]), c.patch_size
            ).reshape(B, T, S, c.token_embed_dim)

        dup = lambda a: None if a is None else jnp.concatenate([a, a], axis=0)
        if use_cfg:
            uncond = jnp.broadcast_to(
                self.fake_latent, (B, text_latents.shape[-1])
            ).astype(text_latents.dtype)
            text_latents = jnp.concatenate([text_latents, uncond], axis=0)
            cond_tokens = dup(cond_tokens)
            history_actions = dup(history_actions)
            actions = dup(actions)
            if proprio is not None:
                proprio = jax.tree.map(dup, dict(proprio))

        k_order, key = jax.random.split(key)
        order_rank = sample_orders(k_order, B, S)  # (B, S) ranks
        # order_perm[b, r] = token position with rank r (inverse permutation):
        # rank r tokens un-mask in order, so the tokens newly revealed in a
        # round are the STATIC slice order_perm[:, next_len:cur_len] — the
        # TPU-native replacement for the reference's shape-dynamic
        # mask_to_pred.nonzero() gather (mar_con_unified.py:1090).
        order_perm = jnp.argsort(order_rank, axis=-1)

        tokens = jnp.zeros((B, T, S, c.token_embed_dim))
        wrist_tokens = (
            jnp.zeros((B, T, S, c.token_embed_dim)) if c.predict_wrist_img else None
        )
        spatial_mask = jnp.ones((B, S))
        act_out = None

        # Static per-round mask lengths (cosine schedule, ≥1 newly revealed).
        mask_lens = []
        prev = S
        for step in range(num_iter):
            ml = int(np.floor(S * np.cos(math.pi / 2.0 * (step + 1) / num_iter)))
            ml = max(1, min(prev - 1, ml)) if step < num_iter - 1 else 0
            mask_lens.append(ml)
            prev = ml

        for step in range(num_iter):
            mask = jnp.broadcast_to(spatial_mask[:, None, :], (B, T, S))
            if c.predict_wrist_img:
                proprio = dict(proprio or {})
                proprio["pred_second_image_tokens"] = (
                    dup(wrist_tokens) if use_cfg else wrist_tokens
                )
            h = self.forward_encoder(
                dup(tokens) if use_cfg else tokens,
                dup(mask) if use_cfg else mask,
                cond_tokens,
                task_mode,
                text_latents=text_latents,
                history_actions=history_actions,
                actions=actions,
                proprio=proprio,
                train=False,
            )
            z = self.forward_decoder(h, train=False)

            if c.predict_action and task_mode in (
                "policy_model",
                "inverse_model",
                "full_dynamic_model",
            ):
                key, ka = jax.random.split(key)
                act_out = self.diffactloss.sample(
                    z[:B] if use_cfg else z, ka, temperature=temperature, cfg=1.0
                )

            # this round reveals ranks [next_len, cur_len) — a static-size set
            cur_len = S if step == 0 else mask_lens[step - 1]
            next_len = mask_lens[step]
            n_pred = cur_len - next_len
            pred_pos = jax.lax.dynamic_slice_in_dim(
                order_perm, next_len, n_pred, axis=1
            )  # (B, n_pred) token positions, static shape

            if cfg_schedule == "linear":
                cfg_iter = 1.0 + (cfg - 1.0) * (S - next_len) / S
            else:
                cfg_iter = cfg

            key, kv = jax.random.split(key)
            # gather conditioning for just the revealed positions, all frames
            B2 = 2 * B if use_cfg else B
            pp = dup(pred_pos) if use_cfg else pred_pos
            z_g = jnp.take_along_axis(
                z.reshape(B2, T, S, -1),
                pp[:, None, :, None],
                axis=2,
            )  # (B2, T, n_pred, D)
            sampled = self.diffloss.sample(
                z_g.reshape(B2 * T * n_pred, -1), kv,
                temperature=temperature, cfg=cfg_iter,
            ).reshape(B2, T, n_pred, c.token_embed_dim)[:B]
            # scatter back (batched over B via vmap'd scatter on the S axis)
            tokens = jax.vmap(
                lambda tok, pos, val: tok.at[:, pos].set(val)
            )(tokens, pred_pos, sampled)
            if c.predict_wrist_img:
                key, kw = jax.random.split(key)
                sampled_w = self.diffloss_wrist.sample(
                    z_g.reshape(B2 * T * n_pred, -1), kw,
                    temperature=temperature, cfg=cfg_iter,
                ).reshape(B2, T, n_pred, c.token_embed_dim)[:B]
                wrist_tokens = jax.vmap(
                    lambda tok, pos, val: tok.at[:, pos].set(val)
                )(wrist_tokens, pred_pos, sampled_w)
            spatial_mask = (order_rank < next_len).astype(jnp.float32)

        out_tokens = wrist_tokens if c.predict_wrist_img else tokens
        flat = out_tokens.reshape(B * T, S, c.token_embed_dim)
        frames = unpatchify(flat, c.patch_size, c.vae_embed_dim, c.seq_hw)
        return frames, act_out
