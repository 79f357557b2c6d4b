"""IDDPM-family gaussian diffusion, TPU-native.

Functional re-design of the reference's vendored OpenAI IDDPM library
(reference: unified_video_action/model/autoregressive/diffusion/gaussian_diffusion.py,
respace.py, diffusion_utils.py, __init__.py:11-47). Same math, different architecture:

* All schedule quantities are precomputed once as numpy arrays inside a frozen
  ``GaussianDiffusion`` dataclass. Under ``jit`` they become compile-time constants,
  so per-step coefficient gathers (``arr[t]``) lower to cheap static lookups.
* ``p_sample_loop`` is a ``jax.lax.scan`` over a *static* respaced step count
  (the reference hard-codes ``num_sampling_steps="100"``), so the whole 100-step
  sampler compiles into one fused XLA computation — no per-step host round-trips.
* RNG is explicit: every stochastic entry point takes a ``jax.random`` key.
* Timestep respacing reproduces the reference's ``space_timesteps`` semantics
  (section counts and ``ddimN`` strides), and the denoiser network is always
  conditioned on *original* timesteps via ``timestep_map`` (respace.py:95-109).

The model output convention matches the reference's ``learn_sigma=True`` default:
the denoiser emits ``2*C`` channels on the last axis — epsilon prediction plus the
LEARNED_RANGE variance interpolation coefficient ``v`` in [-1, 1].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
DenoiseFn = Callable[[Array, Array], Array]  # (x_t, t_original) -> (..., 2C)


# ---------------------------------------------------------------------------
# Beta schedules
# ---------------------------------------------------------------------------


def linear_beta_schedule(num_timesteps: int) -> np.ndarray:
    """Linear schedule from the DDPM paper, scaled for any number of steps."""
    scale = 1000.0 / num_timesteps
    return np.linspace(
        scale * 0.0001, scale * 0.02, num_timesteps, dtype=np.float64
    )


def cosine_beta_schedule(num_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Cosine alpha-bar schedule (Nichol & Dhariwal)."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_timesteps):
        t1 = i / num_timesteps
        t2 = (i + 1) / num_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_named_beta_schedule(name: str, num_timesteps: int) -> np.ndarray:
    if name == "linear":
        return linear_beta_schedule(num_timesteps)
    if name == "cosine":
        return cosine_beta_schedule(num_timesteps)
    raise ValueError(f"unknown beta schedule: {name}")


# ---------------------------------------------------------------------------
# Timestep respacing
# ---------------------------------------------------------------------------


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Select a subset of original timesteps given per-section counts.

    Accepts an int, a list of ints, or a string ("100", "25,25", or "ddimN").
    Semantics match the reference (respace.py:12-61).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    elif isinstance(section_counts, int):
        section_counts = [section_counts]

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


# ---------------------------------------------------------------------------
# Numerics helpers (log-likelihoods)
# ---------------------------------------------------------------------------


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal gaussians, elementwise (in nats)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )

def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a gaussian discretized to 1/255-wide buckets on [-1, 1]."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )
    return log_probs


def _mean_flat(x: Array) -> Array:
    """Mean over all axes but the first."""
    return x.reshape(x.shape[0], -1).mean(axis=-1)


# ---------------------------------------------------------------------------
# The diffusion object
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Precomputed schedule quantities (numpy, fp64 internally; fp32 on gather).

    ``timestep_map`` maps the (possibly respaced) internal step index to the
    original training timestep the denoiser was conditioned on.
    """

    betas: np.ndarray
    timestep_map: np.ndarray  # internal idx -> original timestep
    original_num_steps: int

    # derived (filled in __post_init__)
    alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    alphas_cumprod_prev: np.ndarray = dataclasses.field(init=False)
    sqrt_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    log_one_minus_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = dataclasses.field(init=False)
    posterior_variance: np.ndarray = dataclasses.field(init=False)
    posterior_log_variance_clipped: np.ndarray = dataclasses.field(init=False)
    posterior_mean_coef1: np.ndarray = dataclasses.field(init=False)
    posterior_mean_coef2: np.ndarray = dataclasses.field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)

        def _set(name, val):
            object.__setattr__(self, name, val)

        _set("betas", betas)
        _set("alphas_cumprod", acp)
        _set("alphas_cumprod_prev", acp_prev)
        _set("sqrt_alphas_cumprod", np.sqrt(acp))
        _set("sqrt_one_minus_alphas_cumprod", np.sqrt(1.0 - acp))
        _set("log_one_minus_alphas_cumprod", np.log(1.0 - acp))
        _set("sqrt_recip_alphas_cumprod", np.sqrt(1.0 / acp))
        _set("sqrt_recipm1_alphas_cumprod", np.sqrt(1.0 / acp - 1.0))
        _set("posterior_variance", post_var)
        _set(
            "posterior_log_variance_clipped",
            np.log(np.append(post_var[1], post_var[1:])),
        )
        _set("posterior_mean_coef1", betas * np.sqrt(acp_prev) / (1.0 - acp))
        _set(
            "posterior_mean_coef2",
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
        )

    # -- basic properties ---------------------------------------------------

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    def _gather(self, arr: np.ndarray, t: Array, ndim: int) -> Array:
        """Gather per-timestep coefficients and broadcast to an ndim-rank shape."""
        out = jnp.asarray(arr, dtype=jnp.float32)[t]
        return out.reshape(out.shape + (1,) * (ndim - out.ndim))

    # -- forward process ----------------------------------------------------

    def q_mean_variance(self, x_start: Array, t: Array):
        mean = self._gather(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = self._gather(1.0 - self.alphas_cumprod, t, x_start.ndim)
        log_variance = self._gather(
            self.log_one_minus_alphas_cumprod, t, x_start.ndim
        )
        return mean, variance, log_variance

    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        nd = x_start.ndim
        return (
            self._gather(self.sqrt_alphas_cumprod, t, nd) * x_start
            + self._gather(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start: Array, x_t: Array, t: Array):
        nd = x_t.ndim
        mean = (
            self._gather(self.posterior_mean_coef1, t, nd) * x_start
            + self._gather(self.posterior_mean_coef2, t, nd) * x_t
        )
        variance = self._gather(self.posterior_variance, t, nd)
        log_variance = self._gather(self.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    # -- reverse process ----------------------------------------------------

    def _predict_xstart_from_eps(self, x_t: Array, t: Array, eps: Array) -> Array:
        nd = x_t.ndim
        return (
            self._gather(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - self._gather(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _map_t(self, t: Array) -> Array:
        """Map internal (respaced) step index to the original model timestep."""
        return jnp.asarray(self.timestep_map, dtype=jnp.int32)[t]

    def p_mean_variance(
        self,
        model_output: Array,
        x_t: Array,
        t: Array,
        clip_denoised: bool = True,
    ):
        """LEARNED_RANGE + EPSILON posterior for one step.

        ``model_output`` carries (eps, v) concatenated on the last axis.
        """
        c = x_t.shape[-1]
        eps = model_output[..., :c]
        v = model_output[..., c:]
        nd = x_t.ndim
        min_log = self._gather(self.posterior_log_variance_clipped, t, nd)
        max_log = self._gather(np.log(self.betas), t, nd)
        frac = (v + 1.0) / 2.0
        model_log_variance = frac * max_log + (1.0 - frac) * min_log
        model_variance = jnp.exp(model_log_variance)

        pred_xstart = self._predict_xstart_from_eps(x_t, t, eps)
        if clip_denoised:
            pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
        mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x_t, t)
        return {
            "mean": mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    def p_sample_loop(
        self,
        denoise_fn: DenoiseFn,
        noise: Array,
        key: Array,
        clip_denoised: bool = True,
        temperature: float = 1.0,
    ) -> Array:
        """Full ancestral sampling as one ``lax.scan`` (static step count).

        ``denoise_fn(x, t_original)`` must return (..., 2C). Noise is scaled by
        ``temperature`` (reference gaussian_diffusion.py:439-443); no noise is
        added at t == 0.
        """
        num_steps = self.num_timesteps
        step_keys = jax.random.split(key, num_steps)

        def body(x, inp):
            t_idx, k = inp
            t = jnp.full(x.shape[:1], t_idx, dtype=jnp.int32)
            model_out = denoise_fn(x, self._map_t(t))
            out = self.p_mean_variance(model_out, x, t, clip_denoised=clip_denoised)
            z = jax.random.normal(k, x.shape, dtype=x.dtype)
            nonzero = (t_idx != 0).astype(x.dtype)
            x_next = (
                out["mean"]
                + nonzero * jnp.exp(0.5 * out["log_variance"]) * z * temperature
            )
            return x_next, None

        ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
        x_final, _ = jax.lax.scan(body, noise, (ts, step_keys))
        return x_final

    def ddim_sample_loop(
        self,
        denoise_fn: DenoiseFn,
        noise: Array,
        key: Array,
        clip_denoised: bool = True,
        eta: float = 0.0,
    ) -> Array:
        """DDIM sampling over the (respaced) schedule as a ``lax.scan``."""
        num_steps = self.num_timesteps
        step_keys = jax.random.split(key, num_steps)
        acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)
        acp_prev = jnp.asarray(self.alphas_cumprod_prev, dtype=jnp.float32)

        def body(x, inp):
            t_idx, k = inp
            t = jnp.full(x.shape[:1], t_idx, dtype=jnp.int32)
            model_out = denoise_fn(x, self._map_t(t))
            out = self.p_mean_variance(model_out, x, t, clip_denoised=clip_denoised)
            x0 = out["pred_xstart"]
            nd = x.ndim
            a_t = self._gather(self.alphas_cumprod, t, nd)
            a_prev = self._gather(self.alphas_cumprod_prev, t, nd)
            eps = (
                self._gather(self.sqrt_recip_alphas_cumprod, t, nd) * x - x0
            ) / self._gather(self.sqrt_recipm1_alphas_cumprod, t, nd)
            sigma = (
                eta
                * jnp.sqrt((1 - a_prev) / (1 - a_t))
                * jnp.sqrt(1 - a_t / a_prev)
            )
            mean_pred = (
                x0 * jnp.sqrt(a_prev)
                + jnp.sqrt(1 - a_prev - sigma**2) * eps
            )
            z = jax.random.normal(k, x.shape, dtype=x.dtype)
            nonzero = (t_idx != 0).astype(x.dtype)
            return mean_pred + nonzero * sigma * z, None

        ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
        x_final, _ = jax.lax.scan(body, noise, (ts, step_keys))
        return x_final

    # -- training -----------------------------------------------------------

    def vb_terms_bpd(
        self,
        model_output: Array,
        x_start: Array,
        x_t: Array,
        t: Array,
        clip_denoised: bool = False,
    ) -> Array:
        """Variational-bound term in bits-per-dim (KL, or decoder NLL at t=0)."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_output, x_t, t, clip_denoised=clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = _mean_flat(kl) / math.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = _mean_flat(decoder_nll) / math.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl)

    def training_losses(
        self,
        denoise_fn: DenoiseFn,
        x_start: Array,
        t: Array,
        key: Optional[Array] = None,
        noise: Optional[Array] = None,
    ) -> dict:
        """MSE(eps) + learned-range VB loss, per batch element (shape [N]).

        ``t`` indexes *this* schedule (for the training schedule the map is
        identity). The VB term sees the stop-gradient'ed eps so the variance
        head cannot corrupt the mean prediction. Pass ``noise`` explicitly for
        deterministic replay (parity tests); otherwise it is drawn from ``key``.
        """
        if noise is None:
            assert key is not None, "training_losses needs key or noise"
            noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        model_output = denoise_fn(x_t, self._map_t(t))

        c = x_start.shape[-1]
        eps = model_output[..., :c]
        v = model_output[..., c:]
        frozen_out = jnp.concatenate([jax.lax.stop_gradient(eps), v], axis=-1)
        vb = self.vb_terms_bpd(frozen_out, x_start, x_t, t, clip_denoised=False)
        mse = _mean_flat((noise - eps) ** 2)
        return {"loss": mse + vb, "mse": mse, "vb": vb}


def create_diffusion(
    timestep_respacing,
    noise_schedule: str = "cosine",
    diffusion_steps: int = 1000,
) -> GaussianDiffusion:
    """Factory matching the reference defaults (diffusion/__init__.py:11-47):
    learn_sigma=True (LEARNED_RANGE), EPSILON mean type, MSE loss."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    use_timesteps = space_timesteps(diffusion_steps, timestep_respacing)

    # Respace: keep only selected steps; recompute betas from kept alpha-bars.
    alphas_cumprod = np.cumprod(1.0 - betas)
    timestep_map, new_betas = [], []
    last_alpha_cumprod = 1.0
    for i, acp in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - acp / last_alpha_cumprod)
            last_alpha_cumprod = acp
            timestep_map.append(i)
    return GaussianDiffusion(
        betas=np.array(new_betas, dtype=np.float64),
        timestep_map=np.array(timestep_map, dtype=np.int64),
        original_num_steps=diffusion_steps,
    )
