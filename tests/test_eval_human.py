"""eval_human demo loop driven headless end-to-end.

The reference's eval_human.py keeps a deque of camera frames, predicts a
keypoint chunk per frame, and overlays it (eval_human.py:67-126,171-190).
Round 1 never exercised the loop (no camera); here a fake capture source and
a frame sink drive ``run_stream`` with a tiny policy — obs windowing,
prediction, and overlay all run for real.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from eval_human import plot_keypoints, run_stream
from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy



pytestmark = pytest.mark.slow

class FakeCap:
    """cv2.VideoCapture stand-in: N synthetic BGR frames, then EOF."""

    def __init__(self, n=6, size=64, seed=0):
        self.rng = np.random.RandomState(seed)
        self.left = n
        self.size = size

    def read(self):
        if self.left <= 0:
            return False, None
        self.left -= 1
        return True, self.rng.randint(
            0, 255, (self.size, self.size, 3), dtype=np.uint8
        )


@pytest.fixture(scope="module")
def tiny_policy():
    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [2]}},
        vae_model_params={
            "autoencoder_path": None,
            "ddconfig": {"vae_embed_dim": 8, "ch_mult": [1, 1, 2, 2], "ch": 32},
        },
        autoregressive_model_params={
            "model_size": "custom",
            "encoder_embed_dim": 64, "encoder_depth": 1, "encoder_num_heads": 4,
            "decoder_embed_dim": 64, "decoder_depth": 1, "decoder_num_heads": 4,
            "img_size": 32, "vae_stride": 8, "vae_embed_dim": 8,
            "diffloss_d": 1, "diffloss_w": 32,
            "diffloss_act_d": 1, "diffloss_act_w": 32,
            "num_sampling_steps": "2", "act_diff_testing_steps": "2",
            "attn_dropout": 0.0, "proj_dropout": 0.0,
            "pretrained_model_path": None,
        },
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="pusht",
        compute_dtype="float32",
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    return policy, {"mar": params["mar"], "vae": params["vae"]}


def test_run_stream_headless(tiny_policy):
    policy, eval_params = tiny_policy
    seen = []

    def on_frame(vis, kp):
        seen.append((vis.copy(), np.asarray(kp)))

    n = run_stream(
        policy, eval_params, FakeCap(n=4), n_obs_steps=16,
        display=False, on_frame=on_frame,
    )
    assert n == 4 and len(seen) == 4
    vis, kp = seen[0]
    assert vis.shape == (64, 64, 3) and vis.dtype == np.uint8
    assert kp.shape == (2,) and np.isfinite(kp).all()


def test_run_stream_max_frames(tiny_policy):
    policy, eval_params = tiny_policy
    n = run_stream(
        policy, eval_params, FakeCap(n=100), n_obs_steps=16,
        display=False, max_frames=2,
    )
    assert n == 2


def test_plot_keypoints_draws_in_bounds():
    frame = np.zeros((64, 64, 3), np.uint8)
    out = plot_keypoints(frame, np.array([0.5, 0.5, 0.9, 0.1]))
    assert out.sum() > 0  # circles drawn
