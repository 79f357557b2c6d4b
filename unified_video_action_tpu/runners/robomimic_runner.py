"""Robomimic (robosuite) rollout harness.

Equivalent of the reference's ``RobomimicImageRunner``
(env_runner/robomimic_image_runner.py:46-385): n_train envs reset to demo
init states from the dataset hdf5 + n_test seeded envs, shape_meta-driven obs
dicts, abs-action rot6d -> axis-angle ``undo_transform_action`` before
stepping, MultiStep wrapping, per-seed max reward -> mean scores.

robosuite/robomimic are optional heavy dependencies: construction raises a
clear ImportError when absent (this environment ships neither), but the full
rollout logic is here and exercised through the shared loop with PushT.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from unified_video_action_tpu.envs.wrappers import MultiStepWrapper, SyncVectorEnv
from unified_video_action_tpu.runners.base import BaseImageRunner
from unified_video_action_tpu.utils.rotation import RotationTransformer


def _require_robosuite():
    try:
        import robosuite  # noqa: F401
        import robomimic.utils.env_utils  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "RobomimicImageRunner needs robosuite+robomimic (optional extras "
            "not installed in this environment)"
        ) from e


class RobomimicImageWrapper:
    """gym-ify a robosuite EnvRobosuite: shape_meta-driven obs extraction +
    init-state reset (reference env/robomimic/robomimic_image_wrapper.py)."""

    def __init__(self, env, shape_meta: dict, init_state=None, seed=None,
                 render_obs_key: str = "agentview_image"):
        self.env = env
        self.obs_keys = list(shape_meta["obs"].keys())
        self.init_state = init_state
        self._seed = seed
        self.render_obs_key = render_obs_key
        self.render_cache = None

    def _extract_obs(self, raw) -> Dict[str, np.ndarray]:
        obs = {}
        for k in self.obs_keys:
            v = np.asarray(raw[k])
            if v.ndim == 3:  # HWC image -> CHW float
                self.render_cache = v
                v = np.moveaxis(v.astype(np.float32) / 255.0, -1, 0)
            obs[k] = v
        return obs

    def reset(self):
        if self.init_state is not None:
            raw = self.env.reset_to({"states": self.init_state})
        else:
            if self._seed is not None:
                np.random.seed(self._seed)
            raw = self.env.reset()
        return self._extract_obs(raw), {}

    def step(self, action):
        raw, reward, done, info = self.env.step(action)
        return self._extract_obs(raw), float(reward), bool(done), False, info

    def render(self, *a, **k):
        return self.render_cache

    def seed(self, seed=None):
        self._seed = seed

    def close(self):
        self.env.close()


class RobomimicImageRunner(BaseImageRunner):
    def __init__(
        self,
        output_dir: Optional[str] = None,
        dataset_path: Optional[str] = None,
        shape_meta: Optional[dict] = None,
        n_train: int = 6,
        train_start_idx: int = 0,
        n_test: int = 50,
        test_start_seed: int = 100000,
        max_steps: int = 700,
        n_obs_steps: int = 16,
        n_action_steps: int = 8,
        abs_action: bool = True,
        n_envs: Optional[int] = None,
        env_backend: str = "robosuite",
        **kwargs,
    ):
        super().__init__(output_dir)
        self.dataset_path = dataset_path
        self.shape_meta = shape_meta or {}
        self.n_train = n_train
        self.train_start_idx = train_start_idx
        self.n_test = n_test
        self.test_start_seed = test_start_seed
        self.max_steps = max_steps
        self.n_obs_steps = n_obs_steps
        self.n_action_steps = n_action_steps
        self.abs_action = abs_action
        if env_backend not in ("robosuite", "stub", "fetch"):
            raise ValueError(f"unknown env_backend {env_backend!r}")
        self.env_backend = env_backend
        if env_backend == "fetch":
            # real mujoco Fetch physics + native software rendering
            # (envs/fetch_env.py); 4-dim delta actions, so no rot6d undo
            self.abs_action = False
        self.rot_tf = RotationTransformer("axis_angle", "rotation_6d")

    def undo_transform_action(self, action: np.ndarray) -> np.ndarray:
        """(…, 10) pos3+rot6d+grip -> (…, 7) pos3+axis_angle+grip
        (reference :368-385); dual-arm 20 -> 14."""
        if not self.abs_action:
            return action
        from unified_video_action_tpu.runners.base import undo_transform_action

        return undo_transform_action(action, self.rot_tf)

    def _raw_env_factory(self):
        """Return make_raw() -> a robosuite-API env for the selected backend."""
        if self.env_backend == "stub":
            from unified_video_action_tpu.envs.stub import StubRobosuiteEnv

            return lambda seed=0: StubRobosuiteEnv(self.shape_meta, seed=seed)
        if self.env_backend == "fetch":
            from unified_video_action_tpu.envs.fetch_env import FetchImageEnv

            return lambda seed=0: FetchImageEnv(self.shape_meta, seed=seed)
        _require_robosuite()
        import robomimic.utils.env_utils as EnvUtils
        import robomimic.utils.file_utils as FileUtils

        env_meta = FileUtils.get_env_metadata_from_dataset(self.dataset_path)
        if self.abs_action:
            env_meta["env_kwargs"]["controller_configs"]["control_delta"] = False
        # robosuite seeding happens via the wrapper's np.random.seed on reset
        return lambda seed=0: EnvUtils.create_env_from_metadata(
            env_meta=env_meta, render=False,
            render_offscreen=True, use_image_obs=True,
        )

    def _train_init_states(self):
        """First demo state per train episode; zeros for the stub backend when
        no dataset hdf5 is staged."""
        if self.dataset_path and os.path.exists(self.dataset_path):
            import h5py

            states = []
            with h5py.File(self.dataset_path, "r") as f:
                for i in range(self.n_train):
                    demo = f[f"data/demo_{self.train_start_idx + i}"]
                    states.append(np.asarray(demo["states"][0]))
            return states
        if self.env_backend == "stub":
            return [np.zeros(1, np.float32) for _ in range(self.n_train)]
        if self.env_backend == "fetch":
            # no demo file staged: draw seeded initial states from the real
            # env so train/ episodes still exercise the reset_to path
            from unified_video_action_tpu.envs.fetch_env import FetchImageEnv

            env = FetchImageEnv(self.shape_meta)
            states = []
            for i in range(self.n_train):
                np.random.seed(self.train_start_idx + i)
                env.reset()
                states.append(env.get_state()["states"])
            env.close()
            return states
        raise FileNotFoundError(self.dataset_path)

    def _make_envs(self):
        make_raw = self._raw_env_factory()
        fns = []
        for i, init_state in enumerate(self._train_init_states()):
            def make(i=i, init_state=init_state):
                w = RobomimicImageWrapper(make_raw(i), self.shape_meta, init_state)
                return MultiStepWrapper(
                    w, self.n_obs_steps, self.n_action_steps, self.max_steps
                )

            fns.append(("train/", self.train_start_idx + i, make))
        for i in range(self.n_test):
            seed = self.test_start_seed + i

            def make(seed=seed):
                w = RobomimicImageWrapper(make_raw(seed), self.shape_meta, seed=seed)
                return MultiStepWrapper(
                    w, self.n_obs_steps, self.n_action_steps, self.max_steps
                )

            fns.append(("test/", seed, make))
        return fns

    def run(self, policy, params, key=None) -> Dict[str, Any]:
        import collections

        import jax

        key = key if key is not None else jax.random.PRNGKey(0)
        fns = self._make_envs()
        venv = SyncVectorEnv([f for _, _, f in fns])
        try:
            obs = venv.reset()
            done = np.zeros(len(fns), dtype=bool)
            max_reward = np.zeros(len(fns))
            steps = 0
            while not done.all() and steps < self.max_steps:
                key, sub = jax.random.split(key)
                result = policy.predict_action(params, obs, sub)
                env_action = self.undo_transform_action(np.asarray(result["action"]))
                obs, rewards, dones, infos = venv.step(env_action)
                max_reward = np.maximum(max_reward, rewards)
                done |= dones
                steps += self.n_action_steps
        finally:
            venv.close()

        log: Dict[str, Any] = {}
        groups = collections.defaultdict(list)
        for (prefix, seed, _), r in zip(fns, max_reward):
            groups[prefix].append(r)
            log[f"{prefix}sim_max_reward_{seed}"] = float(r)
        for prefix, rs in groups.items():
            log[f"{prefix}mean_score"] = float(np.mean(rs))
        return log
