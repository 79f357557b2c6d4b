"""Fetch pick-and-place backend: robosuite raw-API surface over real mujoco
physics (envs/fetch_env.py) + a RobomimicImageRunner rollout on
env_backend="fetch" — the real-sim counterpart of the stub-backed path
(reference env/robomimic/robomimic_image_wrapper.py:10-113)."""

import numpy as np
import pytest

pytest.importorskip("mujoco")
pytest.importorskip("gymnasium_robotics")

from unified_video_action_tpu.envs.fetch_env import FetchImageEnv


@pytest.fixture(scope="module")
def fetch():
    env = FetchImageEnv(camera_heights=84, camera_widths=84)
    yield env
    env.close()


def test_obs_surface_and_shapes(fetch):
    np.random.seed(0)
    obs = fetch.reset()
    assert set(obs) == {"agentview_image", "robot0_eef_pos",
                        "robot0_gripper_qpos"}
    img = obs["agentview_image"]
    assert img.shape == (84, 84, 3) and img.dtype == np.uint8
    assert len(np.unique(img)) > 20  # a real render
    assert obs["robot0_eef_pos"].shape == (3,)
    assert obs["robot0_gripper_qpos"].shape == (2,)


def test_seeded_reset_determinism(fetch):
    np.random.seed(42)
    a = fetch.reset()
    np.random.seed(42)
    b = fetch.reset()
    np.testing.assert_array_equal(a["agentview_image"], b["agentview_image"])
    np.testing.assert_array_equal(a["robot0_eef_pos"], b["robot0_eef_pos"])


def test_state_roundtrip_through_reset_to(fetch):
    np.random.seed(7)
    obs0 = fetch.reset()
    s = fetch.get_state()
    assert s["states"].shape == (46,)  # nq=22 + nv=21 + goal 3
    for i in range(3):
        fetch.step(np.full(4, 0.5, np.float32))
    obs1 = fetch.reset_to(s)
    np.testing.assert_allclose(fetch.get_state()["states"], s["states"],
                               atol=1e-12)
    # the regenerated observation matches the original state's view
    assert (obs1["agentview_image"] == obs0["agentview_image"]).mean() > 0.99


def test_physics_step_moves_the_gripper(fetch):
    np.random.seed(1)
    obs = fetch.reset()
    p0 = obs["robot0_eef_pos"].copy()
    for _ in range(5):
        obs, r, done, info = fetch.step(
            np.array([1.0, 0.0, 0.0, 0.0], np.float32)
        )
    assert np.linalg.norm(obs["robot0_eef_pos"] - p0) > 0.01
    assert 0.0 <= r <= 1.0


def test_action_validation(fetch):
    np.random.seed(0)
    fetch.reset()
    with pytest.raises(ValueError):
        fetch.step(np.zeros(7, np.float32))


def test_goal_marker_appears_in_image(fetch):
    np.random.seed(3)
    fetch.reset()
    base = fetch._renderer.render(fetch.data)
    marked = fetch.render()
    # the injected goal-site sphere changes pixels the scene alone lacks
    assert (base != marked).any(axis=-1).sum() > 0


@pytest.mark.slow
def test_robomimic_runner_on_fetch_backend(tmp_path):
    from unified_video_action_tpu.runners.robomimic_runner import (
        RobomimicImageRunner,
    )

    class RandomPolicy:
        def __init__(self):
            self.n = 0

        def predict_action(self, params, obs_dict, key, language_goal=None):
            self.n += 1
            B = np.asarray(obs_dict["agentview_image"]).shape[0]
            rng = np.random.default_rng(self.n)
            return {"action": rng.uniform(-1, 1, (B, 8, 4)).astype(np.float32)}

    shape_meta = {
        "obs": {
            "agentview_image": {"shape": [3, 84, 84]},
            "robot0_eef_pos": {"shape": [3]},
        },
        "action": {"shape": [4]},
    }
    runner = RobomimicImageRunner(
        output_dir=str(tmp_path),
        shape_meta=shape_meta,
        n_train=1,
        n_test=2,
        max_steps=16,
        n_obs_steps=2,
        n_action_steps=8,
        env_backend="fetch",
    )
    assert runner.abs_action is False
    log = runner.run(policy=RandomPolicy(), params=None)
    assert "test/mean_score" in log
    assert 0.0 <= log["test/mean_score"] <= 1.0
