"""Real-physics kitchen benchmark + software renderer tests.

Covers the native z-buffer rasterizer (native/raster3d.cpp) against the
pure-numpy fallback, the mujoco-backed KitchenImageEnv's raw LIBERO API
surface (envs/kitchen_env.py), and a LiberoImageRunner rollout on
env_backend="kitchen" — real contact physics end-to-end, the capability the
stub backend only mimics (reference env/libero/envs/env_wrapper.py)."""

import numpy as np
import pytest

pytest.importorskip("mujoco")
pytest.importorskip("gymnasium_robotics")

from unified_video_action_tpu.envs import render3d
from unified_video_action_tpu.envs.kitchen_env import (
    KITCHEN_TASK_PROMPTS,
    KitchenImageEnv,
    task_from_name,
)


# ---------------------------------------------------------------------------
# rasterizer
# ---------------------------------------------------------------------------

def _single_tri():
    cam = np.array(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.6, 2.0]], np.float32
    )
    faces = np.array([[0, 1, 2]], np.int32)
    rgb = np.array([[1.0, 0.2, 0.1]], np.float32)
    return cam, faces, rgb


def test_native_matches_numpy_fallback():
    lib = render3d.get_lib()
    assert lib is not None, "g++ is baked into this image; build must work"
    cam, faces, rgb = _single_tri()
    H = W = 64
    args = (cam, faces, rgb, H, W, 60.0, 60.0, W / 2, H / 2, 0.02,
            np.array([0.0, 0.0, 1.0], np.float32), 0.5, 0.5,
            np.array([0, 0, 0], np.uint8))
    ref = render3d._raster_numpy(*args)

    out = np.empty((H, W, 3), np.uint8)
    zbuf = np.empty((H, W), np.float32)
    lib.uva_raster3d(
        cam, np.int32(len(cam)), faces, rgb, np.int32(len(faces)),
        np.int32(H), np.int32(W), np.float32(60.0), np.float32(60.0),
        np.float32(W / 2), np.float32(H / 2), np.float32(0.02),
        np.array([0.0, 0.0, 1.0], np.float32), np.float32(0.5),
        np.float32(0.5), np.array([0, 0, 0], np.uint8), out, zbuf,
    )
    # identical coverage and colour (same sampling rule, same shading)
    assert (out == ref).mean() > 0.995
    assert out[:, :, 0].max() == 255  # the triangle actually rendered
    # triangle centered -> center pixel lit, corner background
    assert out[32, 32, 0] > 0 and (out[0, 0] == 0).all()


def test_zbuffer_occlusion():
    lib = render3d.get_lib()
    # near red triangle in front of a far green one, same footprint
    cam = np.array(
        [[-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0],
         [-1, -1, 4.0], [1, -1, 4.0], [0, 1, 4.0]], np.float32
    )
    faces = np.array([[3, 4, 5], [0, 1, 2]], np.int32)  # far drawn first? no:
    # order deliberately far-after-near to prove depth testing, not paint order
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    rgb = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    H = W = 48
    out = np.empty((H, W, 3), np.uint8)
    zbuf = np.empty((H, W), np.float32)
    for order in ([0, 1], [1, 0]):
        f = np.ascontiguousarray(faces[order])
        c = np.ascontiguousarray(rgb[order])
        lib.uva_raster3d(
            cam, np.int32(6), f, c, np.int32(2), np.int32(H), np.int32(W),
            np.float32(40.0), np.float32(40.0), np.float32(24.0),
            np.float32(24.0), np.float32(0.02),
            np.array([0.0, 0.0, 1.0], np.float32), np.float32(1.0),
            np.float32(0.0), np.array([0, 0, 0], np.uint8), out, zbuf,
        )
        center = out[24, 24]
        assert center[0] > 200 and center[1] == 0, order  # red (near) wins


def test_near_plane_clipping_keeps_partial_triangles():
    lib = render3d.get_lib()
    # one vertex behind the camera: naive projection would explode; the
    # clipper must keep the in-front part
    cam = np.array(
        [[-1, 0, -1.0], [1, -0.5, 2.0], [1, 0.5, 2.0]], np.float32
    )
    faces = np.array([[0, 1, 2]], np.int32)
    rgb = np.array([[1, 1, 1]], np.float32)
    H = W = 48
    out = np.empty((H, W, 3), np.uint8)
    zbuf = np.empty((H, W), np.float32)
    lib.uva_raster3d(
        cam, np.int32(3), faces, rgb, np.int32(1), np.int32(H), np.int32(W),
        np.float32(40.0), np.float32(40.0), np.float32(24.0), np.float32(24.0),
        np.float32(0.02), np.array([0.0, 0.0, 1.0], np.float32),
        np.float32(1.0), np.float32(0.0), np.array([0, 0, 0], np.uint8),
        out, zbuf,
    )
    assert out.max() == 255  # something survived clipping


# ---------------------------------------------------------------------------
# scene renderer over real mujoco state
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def kitchen():
    env = KitchenImageEnv(
        tasks=["microwave"], camera_heights=96, camera_widths=96
    )
    yield env
    env.close()


def test_scene_renders_nontrivially(kitchen):
    kitchen.seed(0)
    obs = kitchen.reset()
    img = obs["agentview_image"]
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    # a real render: many distinct values, not a flat background
    assert len(np.unique(img)) > 20
    bg = np.asarray(kitchen._renderer.background)
    assert (img == bg).all(axis=-1).mean() < 0.5  # scene covers most pixels


def test_env_obs_and_state_surface(kitchen):
    kitchen.seed(3)
    obs = kitchen.reset()
    assert set(obs) == {"agentview_image", "robot0_joint_pos", "kitchen_state"}
    assert obs["kitchen_state"].shape == (59,)
    s = kitchen.get_sim_state()
    assert s.shape == (59,)  # nq=30 + nv=29
    a = np.full(9, 0.3, np.float32)
    obs1, r, done, info = kitchen.step(a)
    assert 0.0 <= r <= 1.0 and isinstance(done, bool)
    # physics actually moved the joints
    assert not np.allclose(obs1["kitchen_state"][:9], obs["kitchen_state"][:9])
    # state restore regenerates the original observation (real mujoco
    # set_init_state semantics, reference env_wrapper.py:139-147)
    obs2 = kitchen.set_init_state(s)
    np.testing.assert_allclose(
        kitchen.get_sim_state(), s, rtol=0, atol=1e-12
    )
    assert (obs2["agentview_image"] == obs["agentview_image"]).mean() > 0.99


def test_reset_determinism(kitchen):
    kitchen.seed(11)
    img_a = kitchen.reset()["agentview_image"]
    kitchen.seed(11)
    img_b = kitchen.reset()["agentview_image"]
    np.testing.assert_array_equal(img_a, img_b)


def test_action_validation(kitchen):
    kitchen.seed(0)
    kitchen.reset()
    with pytest.raises(ValueError):
        kitchen.step(np.zeros(7, np.float32))


def test_task_from_name():
    assert task_from_name("kitchen_microwave_demo.hdf5") == "microwave"
    assert task_from_name("x/kitchen_light_switch_demo.hdf5") == "light switch"
    assert task_from_name("unrelated.hdf5") is None


# ---------------------------------------------------------------------------
# runner e2e on the kitchen backend
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_libero_runner_on_kitchen_backend(tmp_path):
    from unified_video_action_tpu.runners.libero_runner import (
        LiberoImageRunner,
    )

    class RandomPolicy:
        def __init__(self):
            self.language_goals = []

        def predict_action(self, params, obs_dict, key, language_goal=None):
            self.language_goals.append(language_goal)
            imgs = obs_dict["agentview_rgb"]
            B = np.asarray(imgs).shape[0]
            rng = np.random.default_rng(len(self.language_goals))
            return {"action": rng.uniform(-1, 1, (B, 8, 9)).astype(np.float32)}

    runner = LiberoImageRunner(
        "kitchen_microwave_demo.hdf5",
        output_dir=str(tmp_path),
        n_test=2,
        max_steps=24,
        n_obs_steps=2,
        n_action_steps=8,
        env_backend="kitchen",
    )
    assert runner.language_goal == KITCHEN_TASK_PROMPTS["microwave"]
    assert runner.abs_action is False
    log = runner.run(policy=RandomPolicy(), params=None)
    assert "test/mean_score" in log
    assert 0.0 <= log["test/mean_score"] <= 1.0
