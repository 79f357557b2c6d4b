"""Benchmark registry tests (envs/benchmark.py).

The registry mirrors the reference's suite API
(env/libero/benchmark/__init__.py:1-219): case-insensitive lookup, Task
NamedTuple schema, Benchmark enumeration methods, task-order permutation
semantics, and per-task init states / executable envs — here backed by the
real-mujoco kitchen and fetch scenes rather than the vendored LIBERO fork.
"""

import numpy as np
import pytest

from unified_video_action_tpu.envs import benchmark as B


def test_registry_contains_reference_suites():
    d = B.get_benchmark_dict()
    for name in ("libero_spatial", "libero_object", "libero_goal",
                 "libero_90", "libero_10", "libero_100",
                 "kitchen", "fetch"):
        assert name in d, name
    # case-insensitive lookup, same contract as the reference
    assert B.get_benchmark("KITCHEN") is B.get_benchmark("kitchen")


def test_task_schema_matches_reference():
    assert B.Task._fields == (
        "name", "language", "problem", "problem_folder",
        "bddl_file", "init_states_file",
    )


def test_language_from_filename_rules():
    # LIBERO-100 style: scene prefix dropped
    assert (
        B.grab_language_from_filename(
            "KITCHEN_SCENE3_turn_on_the_stove.bddl")
        == "turn on the stove"
    )
    # lowercase suites: full stem
    assert (
        B.grab_language_from_filename("pick_up_the_mug.bddl")
        == "pick up the mug"
    )


def test_kitchen_suite_enumeration():
    b = B.get_benchmark("kitchen")()
    assert b.get_num_tasks() == 7
    names = b.get_task_names()
    assert "kitchen_microwave" in names
    t = b.get_task(names.index("kitchen_microwave"))
    assert t.language == "open the microwave door"
    assert t.problem == "FrankaKitchen"
    assert b.get_task_demonstration(0).endswith("_demo.hdf5")
    embs = [np.zeros(3)] * b.get_num_tasks()
    b.set_task_embs(embs)
    assert b.get_task_emb(2) is embs[2]


def test_task_order_permutation_semantics():
    b0 = B.get_benchmark("fetch")(task_order_index=0)
    assert b0.get_task_names()[0] == "fetch_pick_and_place"
    # order i is a deterministic permutation, stable across constructions
    assert (
        B.task_order(3, 10) == B.task_order(3, 10)
        and B.task_order(3, 10) != list(range(10))
    )


def test_upstream_libero_raises_clear_importerror():
    pytest.importorskip("numpy")  # always passes; keeps structure uniform
    try:
        import libero  # noqa: F401

        pytest.skip("libero installed: upstream path is live")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="LIBERO package"):
        B.get_benchmark("libero_10")()


@pytest.mark.slow
def test_kitchen_init_states_roundtrip():
    pytest.importorskip("mujoco")
    pytest.importorskip("gymnasium_robotics")
    b = B.get_benchmark("kitchen")()
    i = b.get_task_names().index("kitchen_microwave")
    states = b.get_task_init_states(i, n=2)
    assert states.ndim == 2 and states.shape[0] == 2
    env = b.make_task_env(i, camera_heights=64, camera_widths=64)
    try:
        env.reset()
        obs = env.set_init_state(states[1])
        assert obs["agentview_image"].shape == (64, 64, 3)
        # the restored mujoco state matches what was recorded
        np.testing.assert_allclose(env.get_sim_state(), states[1], atol=1e-9)
    finally:
        env.close()


@pytest.mark.slow
def test_fetch_suite_env_executes():
    pytest.importorskip("mujoco")
    pytest.importorskip("gymnasium_robotics")
    b = B.get_benchmark("fetch")()
    env = b.make_task_env(0, camera_heights=48, camera_widths=48)
    try:
        env.reset()
        obs, _r, _d, _i = env.step(np.zeros(4, np.float32))
        # robosuite convention: HWC uint8 frames
        assert obs["agentview_image"].shape == (48, 48, 3)
    finally:
        env.close()
