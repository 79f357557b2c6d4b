"""bench.py headline-tier selection (pure logic, no device).

The judged ``value`` must be the trained deployed flagship when its real
checkpoint loaded, the parity workload otherwise, and never a random-weight
deployed number while a parity number exists.
"""

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

PARITY = {"chunks_per_sec": 124.0, "mfu": 0.64, "p50_step_latency_ms": 9.0}
DEPLOYED_TRAINED = {
    "chunks_per_sec": 600.0,
    "mfu": 0.3,
    "p50_step_latency_ms": 3.0,
    "trained_weights": True,
    "test_mean_score": 0.8,
}
DEPLOYED_RANDOM = {
    **DEPLOYED_TRAINED, "trained_weights": False, "test_mean_score": None
}
DEPLOYED_UNSCORED = {**DEPLOYED_TRAINED, "test_mean_score": None}
DEPLOYED_WEAK = {**DEPLOYED_TRAINED, "test_mean_score": 0.1}


def test_trained_scored_deployed_wins():
    out = bench.select_headline(PARITY, DEPLOYED_TRAINED)
    assert out["headline_tier"] == "deployed"
    assert out["value"] == 600.0
    assert out["mfu"] == 0.3  # mirrors the headline tier
    assert out["vs_baseline"] == pytest.approx(4.0)


def test_random_deployed_falls_back_to_parity():
    out = bench.select_headline(PARITY, DEPLOYED_RANDOM)
    assert out["headline_tier"] == "parity"
    assert out["value"] == 124.0
    assert out["mfu"] == 0.64
    assert out["vs_baseline"] == pytest.approx(124.0 / 150.0, abs=1e-3)


def test_trained_but_unscored_is_not_promoted():
    out = bench.select_headline(PARITY, DEPLOYED_UNSCORED)
    assert out["headline_tier"] == "parity" and out["value"] == 124.0


def test_trained_but_weak_score_is_not_promoted():
    out = bench.select_headline(PARITY, DEPLOYED_WEAK)
    assert out["headline_tier"] == "parity" and out["value"] == 124.0


def test_parity_only():
    out = bench.select_headline(PARITY, None)
    assert out["headline_tier"] == "parity" and out["value"] == 124.0


def test_deployed_only_random_is_labeled():
    out = bench.select_headline(None, DEPLOYED_RANDOM)
    assert out["headline_tier"] == "deployed_random_weights"
    assert out["value"] == 600.0


def test_deployed_only_trained_unscored_is_labeled_ungated():
    out = bench.select_headline(None, DEPLOYED_UNSCORED)
    assert out["headline_tier"] == "deployed_ungated"
    assert out["value"] == 600.0


def test_deployed_quality_reads_real_logs_only(tmp_path, monkeypatch):
    import json as _json

    d = tmp_path / "data" / "outputs" / "eval_final"
    d.mkdir(parents=True)
    (d / "eval_log_a.json").write_text(
        _json.dumps({"test_mean_score": 0.9, "env_backend": "stub"})
    )
    (d / "eval_log_b.json").write_text(
        _json.dumps({"test_mean_score": 0.62, "env_backend": "real"})
    )
    monkeypatch.chdir(tmp_path)  # deployed_quality globs relative to cwd
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.deployed_quality() == pytest.approx(0.62)


DIGEST = "d" * 64  # the checkpoint identity eval_sim stamps into its logs


def _write_eval(
    tmp_path,
    subdir,
    score,
    backend="real",
    digest=DIGEST,
    act_steps=None,
    quant="bf16",
    root="data/outputs",
):
    import json as _json

    if act_steps is None:
        act_steps = {
            "eval_ddim10": "ddim10",
            "eval_25step": "25",
            "eval_int8": "ddim10",
        }.get(subdir, "100")
    d = tmp_path / root / subdir
    d.mkdir(parents=True, exist_ok=True)
    (d / "eval_log_x.json").write_text(
        _json.dumps(
            {
                "test_mean_score": score,
                "env_backend": backend,
                "ckpt_digest": digest,
                "act_steps": act_steps,
                "serving_quant": quant,
            }
        )
    )


def test_reduced_steps_engaged_when_quality_holds(tmp_path, monkeypatch):
    _write_eval(tmp_path, "eval_final", 0.8)
    _write_eval(tmp_path, "eval_ddim10", 0.75)  # >= 0.9 * 0.8
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.reduced_step_choice(DIGEST) == ("ddim10", pytest.approx(0.75))


def test_reduced_steps_fall_back_to_25_then_full(tmp_path, monkeypatch):
    _write_eval(tmp_path, "eval_final", 0.8)
    _write_eval(tmp_path, "eval_ddim10", 0.5)   # quality collapsed at 10
    _write_eval(tmp_path, "eval_25step", 0.78)  # holds at 25
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.reduced_step_choice(DIGEST) == ("25", pytest.approx(0.78))

    # collapse at 25 too -> no reduction
    _write_eval(tmp_path, "eval_25step", 0.3)
    assert bench.reduced_step_choice(DIGEST) is None


def test_reduced_steps_require_a_full_step_gate(tmp_path, monkeypatch):
    # no full-step score, or a weak one -> never engage reduction
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.reduced_step_choice(DIGEST) is None
    _write_eval(tmp_path, "eval_final", 0.1)  # below MIN_DEPLOYED_SCORE
    _write_eval(tmp_path, "eval_ddim10", 0.95)
    assert bench.reduced_step_choice(DIGEST) is None


def test_reduced_steps_ignore_stub_scores(tmp_path, monkeypatch):
    _write_eval(tmp_path, "eval_final", 0.8)
    _write_eval(tmp_path, "eval_ddim10", 0.9, backend="stub")
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.reduced_step_choice(DIGEST) is None


def test_evidence_from_other_weights_never_gates(tmp_path, monkeypatch):
    """ADVICE r3: after a retrain, eval logs recorded on the OLD checkpoint
    must not gate the new one — the digest ties evidence to weights."""
    _write_eval(tmp_path, "eval_final", 0.8, digest="e" * 64)
    _write_eval(tmp_path, "eval_ddim10", 0.79, digest="e" * 64)
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.deployed_quality(DIGEST) is None
    assert bench.reduced_step_choice(DIGEST) is None
    assert bench.quant_choice(DIGEST) is None
    # unstamped legacy logs are rejected too once a digest is required
    _write_eval(tmp_path, "eval_final", 0.8, digest=None)
    assert bench.deployed_quality(DIGEST) is None


def test_committed_export_logs_back_the_gates(tmp_path, monkeypatch):
    """After an environment reset wipes data/, the eval evidence committed
    next to the slim export still drives every quality gate."""
    _write_eval(tmp_path, "eval_final", 0.8, root=bench.EXPORT_DIR)
    _write_eval(tmp_path, "eval_ddim10", 0.79, root=bench.EXPORT_DIR)
    _write_eval(tmp_path, "eval_int8", 0.76, quant="int8", root=bench.EXPORT_DIR)
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.deployed_quality(DIGEST) == pytest.approx(0.8)
    assert bench.reduced_step_choice(DIGEST) == ("ddim10", pytest.approx(0.79))
    assert bench.quant_choice(DIGEST, serve_steps="ddim10") == pytest.approx(0.76)


def test_live_run_logs_shadow_the_committed_export(tmp_path, monkeypatch):
    # a fresh data/outputs eval (new training run) must win over the export's
    # stale committed evidence
    _write_eval(tmp_path, "eval_final", 0.8, root=bench.EXPORT_DIR)
    _write_eval(tmp_path, "eval_final", 0.5)
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.deployed_quality(DIGEST) == pytest.approx(0.5)


def test_int8_engages_only_when_quality_holds(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.quant_choice(DIGEST, serve_steps="ddim10") is None  # no evidence
    _write_eval(tmp_path, "eval_final", 0.8)
    assert bench.quant_choice(DIGEST, serve_steps="ddim10") is None  # no int8 eval
    _write_eval(tmp_path, "eval_int8", 0.5, quant="int8")  # quality collapsed
    assert bench.quant_choice(DIGEST, serve_steps="ddim10") is None
    _write_eval(tmp_path, "eval_int8", 0.75, quant="int8")  # >= 0.9 * full
    assert bench.quant_choice(DIGEST, serve_steps="ddim10") == pytest.approx(0.75)


def test_int8_requires_matching_act_steps(tmp_path, monkeypatch):
    """ADVICE r3: the int8 evidence was recorded at ddim10 — if the reduced
    -step gate did NOT engage (bench will serve 100 steps), that evidence
    must not enable int8 for the unevaluated 100-step+int8 config."""
    _write_eval(tmp_path, "eval_final", 0.8)
    _write_eval(tmp_path, "eval_int8", 0.75, quant="int8", act_steps="ddim10")
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.quant_choice(DIGEST, serve_steps="100") is None
    assert bench.quant_choice(DIGEST, serve_steps="ddim10") == pytest.approx(0.75)


def test_int8_ignores_stub_scores(tmp_path, monkeypatch):
    _write_eval(tmp_path, "eval_final", 0.8)
    _write_eval(tmp_path, "eval_int8", 0.9, backend="stub", quant="int8")
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    assert bench.quant_choice(DIGEST, serve_steps="ddim10") is None


def test_headline_is_the_median_window():
    """VERDICT r3 weak #2: best-of-N on a shared tunnel is self-flattery; the
    headline must be the median of the timed windows."""
    import inspect

    src = inspect.getsource(bench.measure_tier)
    assert "np.median" in src
    assert "max(window_rates)" not in src.split("np.median")[0]


def test_pick_deployed_ckpt_prefers_evidence(tmp_path, monkeypatch):
    """The measured checkpoint and the gating evidence must be the same
    artifact: a candidate with digest-matched evidence wins over an earlier
    candidate without any."""
    from unified_video_action_tpu.utils.ckpt_id import ckpt_digest

    stage2 = tmp_path / "data/outputs/pusht_small_stage2/checkpoints/latest"
    export = tmp_path / bench.EXPORT_DIR / "latest"
    for d, content in ((stage2, b"new-weights"), (export, b"exported-weights")):
        d.mkdir(parents=True)
        (d / "w.bin").write_bytes(content)
    _write_eval(tmp_path, "eval_final", 0.8, digest=ckpt_digest(str(export)),
                root=bench.EXPORT_DIR)
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("UVA_DEPLOYED_SCORE_JSON", raising=False)
    monkeypatch.delenv("UVA_DEPLOYED_CKPT", raising=False)
    ckpt, digest, quality = bench.pick_deployed_ckpt()
    assert ckpt == os.path.join(bench.EXPORT_DIR, "latest")
    assert digest == ckpt_digest(str(export))
    assert quality == pytest.approx(0.8)

    # no evidence anywhere -> first existing candidate, quality None
    (tmp_path / bench.EXPORT_DIR / "eval_final/eval_log_x.json").unlink()
    ckpt, digest, quality = bench.pick_deployed_ckpt()
    assert ckpt == "data/outputs/pusht_small_stage2/checkpoints/latest"
    assert quality is None


def test_deployed_arch_follows_checkpoint_cfg(tmp_path):
    """The deployed tier must serve the architecture recorded in the served
    checkpoint's embedded cfg: the round-4 export is mar_base-width (12+12
    blocks) while bench's fallback default is mar_small (6+6) — loading the
    former into the latter silently size-matches half the network and
    attaches quality evidence the truncated program never earned."""
    import json as _json

    ckpt = tmp_path / "latest"
    ckpt.mkdir()
    (ckpt / "meta.json").write_text(_json.dumps({
        "cfg": {"model": {"policy": {
            "autoregressive_model_params": {
                "model_size": "mar_base", "img_size": 96, "vae_stride": 16,
                "patch_size": 1, "vae_embed_dim": 16,
                "diffloss_d": 6, "diffloss_w": 1024,
                "diffloss_act_d": 6, "diffloss_act_w": 1024,
                "num_sampling_steps": "100", "temperature": 0.95,
                "pretrained_model_path": "data/outputs/gone",
            },
            "vae_model_params": {"ddconfig": {
                "vae_embed_dim": 16, "ch_mult": [1, 1, 2, 2, 4], "ch": 64,
            }},
        }}},
    }))
    policy, img_hw = bench.build_policy("deployed", ckpt=str(ckpt))
    assert policy.mar_cfg.encoder_depth == 12
    assert policy.mar_cfg.decoder_depth == 12
    assert img_hw == 96
    # the embedded pretrained path must never be re-resolved at serving time
    assert policy.amp.get("pretrained_model_path") is None

    # no checkpoint -> the documented mar_small fallback
    policy, _ = bench.build_policy("deployed", ckpt=None)
    assert policy.mar_cfg.encoder_depth == 6


# ---------------------------------------------------------------------------
# Fault tolerance (VERDICT r4 next-round #1): a tier raising mid-measurement
# must still yield one valid JSON line, and transient failures are retried.
# ---------------------------------------------------------------------------

def _run_main(monkeypatch, capsys, tmp_path, measure, tier="both"):
    monkeypatch.setenv("UVA_BENCH_TIER", tier)
    monkeypatch.setattr(bench, "RETRY_SLEEP_S", 0.0)
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "partial.json"))
    monkeypatch.setattr(bench, "probe_backend", lambda: None)
    monkeypatch.setattr(bench, "build_policy", lambda *a, **k: (None, 96))
    monkeypatch.setattr(
        bench, "pick_deployed_ckpt", lambda: (None, None, None)
    )
    monkeypatch.setattr(bench, "measure_tier", measure)
    bench.main()
    import json as _json

    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert lines, "main() must always print a JSON line"
    return _json.loads(lines[-1]), tmp_path / "partial.json"


def test_tier_crash_still_emits_json(monkeypatch, capsys, tmp_path):
    import json as _json

    def boom(policy, img_hw, tag, **kw):
        raise RuntimeError("remote_compile: response body closed")

    out, partial = _run_main(monkeypatch, capsys, tmp_path, boom)
    assert out["value"] == 0 and out["headline_tier"] == "none"
    assert "parity_error" in out and "deployed_error" in out
    # the incremental evidence file survives too
    assert _json.loads(partial.read_text())["value"] == 0


def test_transient_failure_is_retried(monkeypatch, capsys, tmp_path):
    calls = {"n": 0}

    def flaky(policy, img_hw, tag, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient tunnel drop")
        return {"chunks_per_sec": 200.0, "mfu": 0.4}

    out, _ = _run_main(monkeypatch, capsys, tmp_path, flaky, tier="parity")
    assert out["headline_tier"] == "parity" and out["value"] == 200.0
    assert calls["n"] == 2


def test_surviving_tier_is_kept_when_other_crashes(
    monkeypatch, capsys, tmp_path
):
    import json as _json

    def parity_only(policy, img_hw, tag, **kw):
        if tag == "deployed":
            raise RuntimeError("tunnel died mid-deployed")
        return {"chunks_per_sec": 450.0, "mfu": 0.3}

    out, partial = _run_main(monkeypatch, capsys, tmp_path, parity_only)
    # the already-measured parity tier must NOT be discarded (the r4 failure)
    assert out["headline_tier"] == "parity" and out["value"] == 450.0
    assert "deployed_error" in out
    assert _json.loads(partial.read_text())["value"] == 450.0


def test_catastrophic_main_failure_prints_json(monkeypatch, capsys):
    import json as _json
    import subprocess
    import sys

    # drive the real __main__ guard in a subprocess with a poisoned env
    code = subprocess.run(
        [sys.executable, "bench.py"],
        env={
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "UVA_BENCH_TIER": "neither",  # no tier runs; fast
            "UVA_BENCH_PARTIAL": "/tmp/uva_bench_partial_test.json",
        },
        capture_output=True,
        text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        timeout=300,
    )
    line = [
        ln for ln in code.stdout.strip().splitlines() if ln.startswith("{")
    ][-1]
    out = _json.loads(line)
    assert out["metric"] == "pusht_policy_action_chunks_per_sec_per_chip"
