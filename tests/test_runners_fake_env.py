"""LIBERO / robomimic runner rollouts driven end-to-end on the stub env
backend (the real benchmarks are optional heavy extras; see envs/stub.py):
chunked stepping, language-goal pass-through, rot6d->axis-angle
undo_transform_action, NaN guard, and per-task score averaging — plus
eval_sim on the libero10 config running to a score with env_backend=stub."""

import json

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from unified_video_action_tpu.envs.stub import StubLiberoEnv, StubRobosuiteEnv
from unified_video_action_tpu.runners.base import (
    env_rollout,
    undo_transform_action,
)
from unified_video_action_tpu.runners.libero_runner import (
    LIBERO10_TASK_NAMES,
    LiberoImageRunner,
    make_libero_runners,
)
from unified_video_action_tpu.runners.robomimic_runner import RobomimicImageRunner
from unified_video_action_tpu.utils.rotation import RotationTransformer


class ScriptedPolicy:
    """Deterministic fake policy recording how runners call it."""

    def __init__(self, action_dim, n_action_steps=8):
        self.action_dim = action_dim
        self.n_action_steps = n_action_steps
        self.calls = []

    def predict_action(self, params, obs_dict, key, language_goal=None):
        imgs = next(iter(obs_dict.values()))
        B = np.asarray(imgs).shape[0]
        self.calls.append(
            {
                "keys": sorted(obs_dict.keys()),
                "shapes": {k: tuple(np.shape(v)) for k, v in obs_dict.items()},
                "language_goal": language_goal,
            }
        )
        # identity rotation in rot6d ([1,0,0, 0,1,0]) so the undone action is
        # all-zero rotation; pos/grip carry recognizable values
        a = np.zeros((B, self.n_action_steps, self.action_dim), np.float32)
        if self.action_dim == 10:
            a[..., 0] = 0.25
            a[..., 3] = 1.0
            a[..., 7] = 1.0
            a[..., 9] = 0.5
        return {"action": a, "action_pred": a}


def _expected_stub_scores(seeds, max_steps):
    """Replicate envs.stub._StubSim's success schedule."""
    out = []
    for s in seeds:
        if s % 3 == 0 and 10 + (s % 7) * 5 <= max_steps:
            out.append(1.0)
        else:
            out.append(0.0)
    return out


def test_undo_transform_action_golden():
    rot_tf = RotationTransformer("axis_angle", "rotation_6d")
    rng = np.random.RandomState(0)
    aa = rng.randn(5, 3).astype(np.float32)
    rot6 = rot_tf.forward(aa)
    action = np.concatenate(
        [rng.randn(5, 3).astype(np.float32), rot6,
         rng.rand(5, 1).astype(np.float32)], axis=-1
    )
    out = undo_transform_action(action, rot_tf)
    assert out.shape == (5, 7)
    np.testing.assert_allclose(out[:, :3], action[:, :3], atol=1e-6)
    # same rotation (axis-angle may differ by 2*pi wraps; compare matrices)
    np.testing.assert_allclose(
        Rotation.from_rotvec(out[:, 3:6]).as_matrix(),
        Rotation.from_rotvec(aa).as_matrix(),
        atol=1e-5,
    )
    np.testing.assert_allclose(out[:, 6:], action[:, 9:], atol=1e-6)

    # dual-arm 20 -> 14
    dual = np.concatenate([action, action], axis=-1)
    out2 = undo_transform_action(dual, rot_tf)
    assert out2.shape == (5, 14)
    np.testing.assert_allclose(out2[:, :7], out, atol=1e-6)
    np.testing.assert_allclose(out2[:, 7:], out, atol=1e-6)


def test_libero_runner_stub_end_to_end(tmp_path):
    runner = LiberoImageRunner(
        "KITCHEN_SCENE3_turn_on_the_stove_demo.hdf5",
        output_dir=str(tmp_path),
        env_backend="stub",
        n_test=6,
        test_start_seed=99999,  # 99999 and 100002 are divisible by 3
        max_steps=40,
        n_obs_steps=4,
        n_action_steps=4,
        abs_action=True,
    )
    policy = ScriptedPolicy(action_dim=10, n_action_steps=4)
    log = runner.run(policy, params=None)

    seeds = [99999 + i for i in range(6)]
    expected = _expected_stub_scores(seeds, 40)
    for s, e in zip(seeds, expected):
        assert log[f"test/sim_max_reward_{s}"] == e, (s, log)
    assert log["test/mean_score"] == pytest.approx(np.mean(expected))

    # language goal derived from the task filename, passed on every call
    assert all(
        c["language_goal"] == "turn on the stove" for c in policy.calls
    )
    # obs adapter produced stacked CHW float frames under the training key
    shp = policy.calls[0]["shapes"]["agentview_rgb"]
    assert shp == (6, 4, 3, 128, 128)


def test_libero_runner_nan_guard(tmp_path):
    runner = LiberoImageRunner(
        "KITCHEN_SCENE3_x_demo.hdf5", env_backend="stub", n_test=1,
        max_steps=8, n_obs_steps=2, n_action_steps=2,
    )

    class NanPolicy:
        def predict_action(self, params, obs, key, language_goal=None):
            a = np.full((1, 2, 10), np.nan, np.float32)
            return {"action": a, "action_pred": a}

    with pytest.raises(RuntimeError, match="non-finite"):
        runner.run(NanPolicy(), params=None)


def test_make_libero_runners_stub_and_score_averaging(tmp_path):
    runners = make_libero_runners(
        dataset_dir=str(tmp_path / "nonexistent"),
        env_backend="stub",
        n_test=3,
        test_start_seed=99999,
        max_steps=20,
        n_obs_steps=2,
        n_action_steps=2,
    )
    assert len(runners) == len(LIBERO10_TASK_NAMES)
    assert runners[0].log_prefix.endswith("/")

    policy = ScriptedPolicy(action_dim=10, n_action_steps=2)
    log = env_rollout(policy, None, runners[:2])
    per_task = [
        log[runners[0].log_prefix + "test/mean_score"],
        log[runners[1].log_prefix + "test/mean_score"],
    ]
    assert log["test_mean_score"] == pytest.approx(np.mean(per_task))


TOOLHANG_SHAPE_META = {
    "obs": {
        "sideview_image": {"shape": [3, 240, 240], "type": "rgb"},
        "robot0_eye_in_hand_image": {"shape": [3, 240, 240], "type": "rgb"},
        "robot0_eef_pos": {"shape": [3]},
        "robot0_eef_quat": {"shape": [4]},
        "robot0_gripper_qpos": {"shape": [2]},
    },
    "action": {"shape": [10]},
}


def test_robomimic_runner_stub_end_to_end(tmp_path):
    runner = RobomimicImageRunner(
        output_dir=str(tmp_path),
        dataset_path=str(tmp_path / "missing.hdf5"),
        shape_meta=TOOLHANG_SHAPE_META,
        n_train=2,
        n_test=4,
        test_start_seed=99999,
        max_steps=30,
        n_obs_steps=4,
        n_action_steps=4,
        abs_action=True,
        env_backend="stub",
    )
    policy = ScriptedPolicy(action_dim=10, n_action_steps=4)
    log = runner.run(policy, params=None)

    assert "train/mean_score" in log and "test/mean_score" in log
    test_seeds = [99999 + i for i in range(4)]
    expected = _expected_stub_scores(test_seeds, 30)
    for s, e in zip(test_seeds, expected):
        assert log[f"test/sim_max_reward_{s}"] == e
    assert log["test/mean_score"] == pytest.approx(np.mean(expected))

    # the policy saw shape_meta-driven obs: stacked images + lowdims
    shapes = policy.calls[0]["shapes"]
    assert shapes["sideview_image"] == (6, 4, 3, 240, 240)
    assert shapes["robot0_eef_pos"] == (6, 4, 3)
    assert shapes["robot0_gripper_qpos"] == (6, 4, 2)


def test_stub_env_rejects_wrong_action_dim():
    env = StubLiberoEnv(action_dim=7)
    env.seed(3)
    env.reset()
    with pytest.raises(ValueError, match="7-dim"):
        env.step(np.zeros(10, np.float32))  # un-undone rot6d action

    env2 = StubRobosuiteEnv(TOOLHANG_SHAPE_META, seed=0, action_dim=7)
    env2.reset()
    with pytest.raises(ValueError, match="7-dim"):
        env2.step(np.zeros(10, np.float32))


@pytest.mark.slow
def test_eval_sim_libero10_stub(tmp_path):
    """eval_sim on the libero10 config runs to a test_mean_score with the stub
    env backend and a tiny model (VERDICT r1 item 5)."""
    import eval_sim

    out = tmp_path / "eval"
    eval_sim.main(
        [
            "-c", str(tmp_path / "no_ckpt"),
            "-o", str(out),
            "--config-name", "uva_libero10",
            "task.env_runner.env_backend=stub",
            "task.env_runner.n_test=1",
            "task.env_runner.max_steps=8",
            "task.env_runner.n_obs_steps=16",
            "task.env_runner.n_action_steps=8",
            "model.policy.compute_dtype=float32",
            "model.policy.action_model_params.predict_action=true",
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
            "model.policy.autoregressive_model_params.pretrained_model_path=null",
            "model.policy.vae_model_params.autoencoder_path=null",
            "model.policy.vae_model_params.ddconfig.vae_embed_dim=8",
            "model.policy.vae_model_params.ddconfig.ch=32",
            "model.policy.vae_model_params.ddconfig.ch_mult=[1,1,2,2]",
        ]
    )
    logs = list(out.glob("eval_log_*.json"))
    assert len(logs) == 1
    with open(logs[0]) as f:
        log = json.load(f)
    assert "test_mean_score" in log
    assert 0.0 <= log["test_mean_score"] <= 1.0
    # one per-task score per libero10 task
    per_task = [k for k in log if k.endswith("/test/mean_score")]
    assert len(per_task) == len(LIBERO10_TASK_NAMES)
