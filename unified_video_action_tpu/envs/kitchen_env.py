"""Real-physics manipulation benchmark: Franka kitchen with software rendering.

The reference evaluates language-conditioned manipulation on the vendored
LIBERO suite (env/libero/envs/env_wrapper.py OffScreenRenderEnv,
env/libero/benchmark/__init__.py task registry) — robosuite + GPU rendering,
neither of which exists on this host. This module provides the same KIND of
benchmark on what the host does have: the mujoco Franka-kitchen scene
(gymnasium-robotics assets, real contact physics, 7 subtasks with success
predicates) rendered headlessly by our native rasterizer
(envs/render3d.py + native/raster3d.cpp).

``KitchenImageEnv`` exposes the raw LIBERO env API that
``runners.libero_runner._LiberoObsAdapter`` wraps — ``seed`` / ``reset`` ->
dict obs with bottom-up ``agentview_image`` (mujoco GL convention, flipped
upright by the adapter exactly like real LIBERO frames), old-gym 4-tuple
``step``, ``check_success``, and mujoco-state ``set_init_state`` /
``get_sim_state`` — so the full runner stack (MultiStep chunking, NaN guard,
per-task score averaging) drives REAL physics end-to-end with
``env_backend="kitchen"``.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

#: language prompts per kitchen subtask (LIBERO-style language goals;
#: reference language_from_filename usage in env_runner/libero_runner.py)
KITCHEN_TASK_PROMPTS = {
    "microwave": "open the microwave door",
    "kettle": "move the kettle to the back left burner",
    "light switch": "turn on the light switch",
    "slide cabinet": "slide open the cabinet door",
    "hinge cabinet": "open the hinge cabinet door",
    "bottom burner": "turn the oven knob that activates the bottom burner",
    "top burner": "turn the oven knob that activates the top burner",
}

#: agent-view free camera (chosen to frame the arm, stove, microwave and
#: cabinets; see artifacts/round4/kitchen_agentview.png)
AGENT_CAMERA = {"eye": [1.4, -0.9, 2.9], "target": [-0.35, 0.55, 1.9],
                "fovy": 50.0}


def _slug(task: str) -> str:
    return task.replace(" ", "_")


def task_from_name(name: str) -> Optional[str]:
    """kitchen_microwave_demo.hdf5 / kitchen_light_switch -> task key."""
    base = name.rsplit("/", 1)[-1]
    for task in KITCHEN_TASK_PROMPTS:
        if _slug(task) in base:
            return task
    return None


class KitchenImageEnv:
    """Raw-LIBERO-API env over real mujoco Franka-kitchen physics.

    Parameters mirror ``StubLiberoEnv`` / LIBERO's ``OffScreenRenderEnv``
    (camera_heights/camera_widths); ``tasks`` selects which subtasks count
    toward success. Action space: 9-dim [-1, 1] joint+gripper velocity
    commands (the Franka kitchen convention).
    """

    action_dim = 9

    def __init__(
        self,
        tasks: Sequence[str] = ("microwave",),
        camera_heights: int = 128,
        camera_widths: int = 128,
        camera: Optional[dict] = None,
        max_episode_steps: int = 280,
        **_,
    ):
        import gymnasium as gym
        import gymnasium_robotics

        gym.register_envs(gymnasium_robotics)
        self.tasks = list(tasks)
        for t in self.tasks:
            if t not in KITCHEN_TASK_PROMPTS:
                raise KeyError(f"unknown kitchen task {t!r}")
        self._env = gym.make(
            "FrankaKitchen-v1",
            tasks_to_complete=list(self.tasks),
            max_episode_steps=int(max_episode_steps),
        )
        from unified_video_action_tpu.envs.render3d import SceneRenderer

        self._renderer = SceneRenderer(
            self._env.unwrapped.model,
            height=camera_heights,
            width=camera_widths,
            camera=dict(camera or AGENT_CAMERA),
        )
        self._seed: Optional[int] = None
        self._last_state_obs: Optional[np.ndarray] = None
        self.action_log: list = []

    # -- raw LIBERO surface ---------------------------------------------

    def seed(self, seed: int):
        self._seed = int(seed)

    @property
    def language_goal(self) -> str:
        return "; ".join(KITCHEN_TASK_PROMPTS[t] for t in self.tasks)

    def reset(self) -> Dict[str, np.ndarray]:
        obs, _info = self._env.reset(seed=self._seed)
        self.action_log = []
        self._last_state_obs = np.asarray(obs["observation"], np.float32)
        return self._obs()

    def step(self, action):
        a = np.clip(np.asarray(action, np.float32), -1.0, 1.0)
        if a.shape[-1] != self.action_dim:
            raise ValueError(
                f"kitchen env expects {self.action_dim}-dim actions, "
                f"got {a.shape}"
            )
        self.action_log.append(a.copy())
        obs, _r, term, trunc, info = self._env.step(a)
        self._last_state_obs = np.asarray(obs["observation"], np.float32)
        done = bool(term or trunc or self.check_success())
        reward = len(self._completed()) / max(len(self.tasks), 1)
        return self._obs(), float(reward), done, info

    def check_success(self) -> bool:
        return set(self._completed()) >= set(self.tasks)

    def _completed(self) -> Iterable[str]:
        return self._env.unwrapped.episode_task_completions

    # -- mujoco state (real set_init_state semantics: the reference's
    # env_wrapper.py:139-147 restores a sim state then regenerates obs) --

    def get_sim_state(self) -> np.ndarray:
        u = self._env.unwrapped
        d = u.data if hasattr(u, "data") else u.robot_env.data
        return np.concatenate(
            [np.asarray(d.qpos, np.float64), np.asarray(d.qvel, np.float64)]
        )

    def set_init_state(self, init_state) -> Dict[str, np.ndarray]:
        import mujoco

        u = self._env.unwrapped
        d = u.data if hasattr(u, "data") else u.robot_env.data
        m = u.model if hasattr(u, "model") else u.robot_env.model
        vec = np.asarray(init_state, np.float64).ravel()
        nq = m.nq
        d.qpos[:] = vec[:nq]
        d.qvel[:] = vec[nq : nq + m.nv]
        mujoco.mj_forward(m, d)
        return self._obs()

    # -- observations ------------------------------------------------------

    def _obs(self) -> Dict[str, np.ndarray]:
        u = self._env.unwrapped
        d = u.data if hasattr(u, "data") else u.robot_env.data
        img = self._renderer.render(d)
        state = self._last_state_obs
        if state is None:
            state = np.zeros(59, np.float32)
        return {
            # bottom-up rows: mujoco offscreen-GL convention, the obs
            # adapter flips with [::-1] exactly as for real LIBERO frames
            "agentview_image": img[::-1].copy(),
            "robot0_joint_pos": state[:9].copy(),
            "kitchen_state": state.copy(),
        }

    def render(self, camera=None) -> np.ndarray:
        u = self._env.unwrapped
        d = u.data if hasattr(u, "data") else u.robot_env.data
        return self._renderer.render(d, camera=camera)

    def close(self):
        self._env.close()


def available() -> bool:
    """True when mujoco + gymnasium-robotics (and their kitchen assets)
    are importable on this host."""
    try:
        import gymnasium  # noqa: F401
        import gymnasium_robotics  # noqa: F401
        import mujoco  # noqa: F401

        return True
    except Exception:
        return False
