"""PushT rollout evaluation harness.

Equivalent of the reference's ``PushTImageRunner``
(env_runner/pusht_image_runner.py:23-266): n_train seeded train envs (seeds
train_start_seed..) + n_test eval envs (seeds test_start_seed..), each a
``MultiStepWrapper(PushTImageEnv)`` with a 16-frame obs stack and 8-action
chunks, rolled out to max_steps; score per seed = max coverage reward;
produces ``train/mean_score``, ``test/mean_score`` and per-seed logs.

TPU-first: all envs step through ONE batched ``predict_action`` call per
control step (the policy path is a single jitted program, so batch = free
throughput), with env stepping on host between device dispatches.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Optional

import jax
import numpy as np

from unified_video_action_tpu.envs.pusht import PushTImageEnv
from unified_video_action_tpu.envs.wrappers import (
    AsyncVectorEnv,
    MultiStepWrapper,
    SyncVectorEnv,
)


class PushTImageRunner:
    def __init__(
        self,
        output_dir: Optional[str] = None,
        n_train: int = 6,
        n_train_vis: int = 2,
        train_start_seed: int = 0,
        n_test: int = 50,
        n_test_vis: int = 4,
        test_start_seed: int = 100000,
        max_steps: int = 300,
        n_obs_steps: int = 16,
        n_action_steps: int = 8,
        fps: int = 10,
        fix_goal: bool = True,
        legacy_test: bool = True,
        n_envs: Optional[int] = None,
        vector_env: str = "sync",
        latent_cache: bool = False,
        **kwargs,
    ):
        self.latent_cache = latent_cache
        self.output_dir = output_dir
        self.n_obs_steps = n_obs_steps
        self.n_action_steps = n_action_steps
        self.max_steps = max_steps
        self.fps = fps

        self.seeds = [train_start_seed + i for i in range(n_train)] + [
            test_start_seed + i for i in range(n_test)
        ]
        self.prefixes = ["train/"] * n_train + ["test/"] * n_test
        self.fix_goal = fix_goal
        self.legacy = legacy_test
        self.vector_env = vector_env

    def _make_env_fns(self):
        fns = []
        for seed in self.seeds:
            def make(seed=seed):
                env = PushTImageEnv(legacy=self.legacy, fix_goal=self.fix_goal)
                env.seed(seed)
                return MultiStepWrapper(
                    env,
                    n_obs_steps=self.n_obs_steps,
                    n_action_steps=self.n_action_steps,
                    max_episode_steps=self.max_steps,
                )
            fns.append(make)
        return fns

    def run(self, policy, params, key=None, chunk_size: Optional[int] = None) -> Dict[str, Any]:
        key = key if key is not None else jax.random.PRNGKey(0)
        env_fns = self._make_env_fns()
        n = len(env_fns)
        chunk_size = chunk_size or n
        all_rewards = np.zeros(n)

        for start in range(0, n, chunk_size):
            fns = env_fns[start : start + chunk_size]
            venv = (
                AsyncVectorEnv(fns)
                if self.vector_env == "async"
                else SyncVectorEnv(fns)
            )
            try:
                obs = venv.reset()
                done = np.zeros(len(fns), dtype=bool)
                max_reward = np.zeros(len(fns))
                steps = 0
                cache = None
                while not done.all() and steps < self.max_steps:
                    obs_dict = {
                        "image": obs["image"].astype(np.float32),
                        "agent_pos": obs["agent_pos"].astype(np.float32),
                    }
                    key, sub = jax.random.split(key)
                    if self.latent_cache:
                        # reuse VAE latents for the cond frames that repeat as
                        # the obs window slides by n_action_steps
                        result, cache = policy.predict_action_cached(
                            params, obs_dict, sub, cache=cache,
                            n_shift=self.n_action_steps,
                        )
                    else:
                        result = policy.predict_action(params, obs_dict, sub)
                    action = np.asarray(result["action"])
                    obs, rewards, dones, infos = venv.step(action)
                    max_reward = np.maximum(max_reward, rewards)
                    done |= dones
                    steps += self.n_action_steps
                all_rewards[start : start + len(fns)] = max_reward
            finally:
                venv.close()

        log: Dict[str, Any] = {}
        groups = collections.defaultdict(list)
        for prefix, seed, r in zip(self.prefixes, self.seeds, all_rewards):
            groups[prefix].append(r)
            log[f"{prefix}sim_max_reward_{seed}"] = float(r)
        for prefix, rs in groups.items():
            log[f"{prefix}mean_score"] = float(np.mean(rs))
        return log
