"""Real-physics tabletop manipulation behind the robosuite raw env API.

The reference's robomimic eval path drives robosuite sims through
``EnvRobosuite`` (shape_meta obs dicts, ``reset_to({"states": ...})`` demo
resets, old-gym 4-tuple step; reference
env/robomimic/robomimic_image_wrapper.py:10-113). robosuite is not
installable here, but mujoco + the gymnasium-robotics Fetch assets are —
so this module provides the same API surface over the real
FetchPickAndPlace scene, with image observations from the native software
renderer (envs/render3d.py). ``runners.robomimic_runner`` drives it with
``env_backend="fetch"``: real contact physics, seeded goal/object resets,
and true mujoco state round-trips through ``get_state``/``reset_to``.

Actions are the Fetch convention: 4-dim [-1, 1] (dx, dy, dz, gripper).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

#: third-person view framing gripper, object and goal over the table
AGENT_CAMERA = {"eye": [1.95, 0.40, 0.95], "target": [1.33, 0.78, 0.42],
                "fovy": 45.0}


class FetchImageEnv:
    """robosuite-EnvRobosuite-API env over mujoco Fetch pick-and-place."""

    action_dim = 4

    def __init__(
        self,
        shape_meta: Optional[dict] = None,
        seed: int = 0,
        camera_heights: int = 84,
        camera_widths: int = 84,
        env_id: str = "FetchPickAndPlace-v4",
        **_,
    ):
        import gymnasium as gym
        import gymnasium_robotics

        gym.register_envs(gymnasium_robotics)
        self.shape_meta = shape_meta or {
            "obs": {
                "agentview_image": {"shape": [3, camera_heights, camera_widths]},
                "robot0_eef_pos": {"shape": [3]},
                "robot0_gripper_qpos": {"shape": [2]},
            }
        }
        # honor an image size from shape_meta when present
        for spec in self.shape_meta.get("obs", {}).values():
            shape = tuple(spec.get("shape", ()))
            if len(shape) == 3:
                camera_heights, camera_widths = shape[1], shape[2]
                break
        self._env = gym.make(env_id)
        u = self._env.unwrapped
        self.model, self.data = u.model, u.data
        # the object ships table-gray; give it a recognizable colour so the
        # image stream actually carries task state
        import mujoco

        gid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_GEOM, "object0")
        if gid >= 0:
            self.model.geom_rgba[gid] = [0.85, 0.15, 0.1, 1.0]
        from unified_video_action_tpu.envs.render3d import SceneRenderer

        self._renderer = SceneRenderer(
            self.model, height=camera_heights, width=camera_widths,
            camera=dict(AGENT_CAMERA),
        )
        self._seed = int(seed)
        self._raw_obs: Optional[dict] = None
        self.action_log: list = []

    # -- robosuite EnvRobosuite surface ----------------------------------

    def reset(self) -> Dict[str, np.ndarray]:
        # EnvRobosuite-style: the wrapper seeds np.random before calling
        # reset(); derive the episode seed from it so seeded resets are
        # deterministic and unseeded ones vary
        seed = int(np.random.randint(0, 2**31 - 1))
        obs, _info = self._env.reset(seed=seed)
        self._raw_obs = obs
        self.action_log = []
        return self._obs()

    def reset_to(self, state: dict) -> Dict[str, np.ndarray]:
        """Restore a full mujoco state vector [qpos, qvel, goal(3)]
        (reference robomimic_image_wrapper.py:61-67 semantics)."""
        import mujoco

        if self._raw_obs is None:
            # satisfy gymnasium's order enforcement before overwriting the
            # sim state (robomimic's EnvRobosuite allows reset_to first)
            self._env.reset(seed=0)
        vec = np.asarray(state["states"], np.float64).ravel()
        m, d = self.model, self.data
        nq, nv = m.nq, m.nv
        if len(vec) < nq + nv + 3:
            raise ValueError(
                f"state vector needs nq+nv+3={nq + nv + 3} entries, got {len(vec)}"
            )
        d.qpos[:] = vec[:nq]
        d.qvel[:] = vec[nq : nq + nv]
        self._env.unwrapped.goal = vec[nq + nv : nq + nv + 3].copy()
        mujoco.mj_forward(m, d)
        self._raw_obs = self._env.unwrapped._get_obs()
        self.action_log = []
        return self._obs()

    def get_state(self) -> dict:
        d = self.data
        return {
            "states": np.concatenate(
                [
                    np.asarray(d.qpos, np.float64),
                    np.asarray(d.qvel, np.float64),
                    np.asarray(self._env.unwrapped.goal, np.float64),
                ]
            )
        }

    def get_observation(self) -> Dict[str, np.ndarray]:
        return self._obs()

    def step(self, action):
        a = np.clip(np.asarray(action, np.float32), -1.0, 1.0)
        if a.shape[-1] != self.action_dim:
            raise ValueError(
                f"fetch env expects {self.action_dim}-dim actions, got {a.shape}"
            )
        self.action_log.append(a.copy())
        obs, _r, term, trunc, info = self._env.step(a)
        self._raw_obs = obs
        success = float(info.get("is_success", 0.0))
        done = bool(term or trunc or success > 0.5)
        return self._obs(), success, done, info

    def is_success(self) -> Dict[str, bool]:
        """robomimic EnvRobosuite.is_success() shape: {"task": bool}."""
        obs = self._raw_obs
        if obs is None:
            return {"task": False}
        u = self._env.unwrapped
        d = float(
            np.linalg.norm(
                np.asarray(obs["achieved_goal"]) - np.asarray(u.goal)
            )
        )
        return {"task": d < 0.05}

    # -- observations ------------------------------------------------------

    def _obs(self) -> Dict[str, np.ndarray]:
        state = np.asarray(self._raw_obs["observation"], np.float32)
        goal = np.asarray(self._env.unwrapped.goal, np.float32)
        img = self._renderer.render(
            self.data,
            markers=[{"pos": goal, "size": 0.035, "rgba": [0.15, 0.75, 0.2]}],
        )
        full = {
            # bottom-up rows like GL offscreen buffers; the runner wrapper's
            # training pipeline flips/normalizes downstream of shape_meta
            "agentview_image": img[::-1].copy(),
            "robot0_eef_pos": state[:3].copy(),
            "robot0_gripper_qpos": state[9:11].copy(),
            "object": np.concatenate([state[3:6], state[11:14]]),
            "goal": goal,
        }
        out = {}
        for k, spec in self.shape_meta.get("obs", {}).items():
            if k in full:
                out[k] = full[k]
            else:
                out[k] = np.zeros(tuple(spec.get("shape", ())), np.float32)
        for k in ("agentview_image",):  # always expose the render stream
            out.setdefault(k, full[k])
        return out

    def render(self, camera=None) -> np.ndarray:
        goal = np.asarray(self._env.unwrapped.goal, np.float32)
        return self._renderer.render(
            self.data, camera=camera,
            markers=[{"pos": goal, "size": 0.035, "rgba": [0.15, 0.75, 0.2]}],
        )

    def close(self):
        self._env.close()
