"""Preemption-safe training: SIGTERM mid-run → checkpoint → clean exit → resume.

TPU spot/maintenance events deliver SIGTERM to the training process; the
workspace must finish the in-flight step, write latest.ckpt, and exit 0 so a
restarted job (training.resume=true) continues (SURVEY §5.3 — the reference
has no equivalent). Driven as a real subprocess so the signal path is real.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from unified_video_action_tpu.utils.cpu_platform import force_cpu
force_cpu(1)

from unified_video_action_tpu.config import load_config
from unified_video_action_tpu.training.workspace import TrainWorkspace

cfg = load_config("uva_pusht", overrides=[
    "training.debug=false",
    "training.seed=7",
    "training.num_epochs=100000",        # long run: only preemption ends it
    "training.max_train_steps=5",        # short epochs -> frequent loop checks
    "task.dataset.synthetic=3",
    "task.dataset.data_aug=false",
    "model.policy.action_model_params.predict_action=false",
    "model.policy.compute_dtype=float32",
    "model.policy.autoregressive_model_params.model_size=custom",
    "model.policy.autoregressive_model_params.encoder_embed_dim=64",
    "model.policy.autoregressive_model_params.encoder_depth=1",
    "model.policy.autoregressive_model_params.encoder_num_heads=4",
    "model.policy.autoregressive_model_params.decoder_embed_dim=64",
    "model.policy.autoregressive_model_params.decoder_depth=1",
    "model.policy.autoregressive_model_params.decoder_num_heads=4",
    "model.policy.autoregressive_model_params.img_size=32",
    "model.policy.autoregressive_model_params.vae_stride=8",
    "model.policy.autoregressive_model_params.vae_embed_dim=8",
    "model.policy.autoregressive_model_params.diffloss_d=1",
    "model.policy.autoregressive_model_params.diffloss_w=32",
    "model.policy.autoregressive_model_params.diffloss_act_d=1",
    "model.policy.autoregressive_model_params.diffloss_act_w=32",
    "model.policy.autoregressive_model_params.num_sampling_steps=2",
    "model.policy.autoregressive_model_params.act_diff_testing_steps=2",
    "model.policy.autoregressive_model_params.attn_dropout=0.0",
    "model.policy.autoregressive_model_params.proj_dropout=0.0",
    "model.policy.autoregressive_model_params.pretrained_model_path=null",
    "model.policy.vae_model_params.autoencoder_path=null",
    "model.policy.vae_model_params.ddconfig.vae_embed_dim=8",
    "model.policy.vae_model_params.ddconfig.ch=32",
    "model.policy.vae_model_params.ddconfig.ch_mult=[1,1,2,2]",
    "training.rollout_every=100000",     # no rollouts/evals: keep epochs fast
    "training.val_every=100000",
    "training.sample_every=100000",
    "training.checkpoint_every=100000",  # only the preemption save writes
    "dataloader.num_workers=1",
])
ws = TrainWorkspace(cfg, output_dir={out!r})
print("TRAIN_START", flush=True)
ws.run()
print("TRAIN_CLEAN_EXIT", flush=True)
"""


def test_sigterm_checkpoints_and_resumes(tmp_path):
    out = str(tmp_path / "run")
    code = SCRIPT.format(repo=REPO, out=out)
    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
    )
    # wait until training is actually stepping
    import select

    deadline = time.time() + 480
    started = False
    buf = b""
    while time.time() < deadline:
        r, _, _ = select.select([proc.stdout], [], [], 0.5)
        if r:
            chunk = os.read(proc.stdout.fileno(), 65536)
            if not chunk:
                break
            buf += chunk
            if b"TRAIN_START" in buf:
                started = True
                break
    assert started, buf.decode(errors="replace")
    # wait until at least one epoch has completed (first-step jit compile is
    # the long pole), then preempt mid-run
    logs = os.path.join(out, "logs.jsonl")
    # 240s is ample in isolation (the run takes ~135s) but the full suite on a
    # 1-vCPU host contends this subprocess down past the deadline; be generous.
    deadline = time.time() + 600
    while time.time() < deadline:
        if os.path.exists(logs) and os.path.getsize(logs) > 0:
            break
        time.sleep(0.5)
    assert os.path.exists(logs) and os.path.getsize(logs) > 0, "no epoch done"

    proc.send_signal(signal.SIGTERM)
    try:
        rest = proc.communicate(timeout=180)[0]
    except subprocess.TimeoutExpired:
        proc.kill()
        raise AssertionError("process did not exit after SIGTERM")
    output = (buf + (rest or b"")).decode(errors="replace")
    assert proc.returncode == 0, output
    assert "TRAIN_CLEAN_EXIT" in output, output
    assert "[preempt]" in output, output

    latest = os.path.join(out, "checkpoints", "latest")
    assert os.path.isdir(latest), output
    assert os.path.exists(os.path.join(latest, "meta.json"))

    # resume from the preemption checkpoint in-process
    from unified_video_action_tpu.config import load_config
    from unified_video_action_tpu.training import checkpoint as ckpt_lib
    import json

    with open(os.path.join(latest, "meta.json")) as f:
        meta = json.load(f)
    assert meta["step"] > 0
