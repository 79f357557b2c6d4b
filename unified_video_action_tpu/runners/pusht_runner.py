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
        n_streams: int = 1,
        chunk_size: Optional[int] = None,
        **kwargs,
    ):
        self.latent_cache = latent_cache
        self.n_streams = n_streams
        self.chunk_size = chunk_size
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

    def run(
        self,
        policy,
        params,
        key=None,
        chunk_size: Optional[int] = None,
        n_streams: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Roll out all seeds. With ``n_streams > 1`` (requires a chunk_size
        that splits the envs into several vector envs), streams are
        interleaved: while stream A's jitted policy program runs on device,
        streams B..'s envs step on host — jax async dispatch makes the
        overlap free (the generalized form of bench.py's two-stream serving
        pattern; stream-depth wall-clock curve in
        benchmarks/bench_rollout_streams.py)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        n_streams = self.n_streams if n_streams is None else n_streams
        env_fns = self._make_env_fns()
        n = len(env_fns)
        chunk_size = chunk_size or self.chunk_size or (
            -(-n // n_streams) if n_streams > 1 else n
        )
        all_rewards = np.zeros(n)

        chunks = [
            (start, env_fns[start : start + chunk_size])
            for start in range(0, n, chunk_size)
        ]
        for g in range(0, len(chunks), max(n_streams, 1)):
            group = chunks[g : g + max(n_streams, 1)]
            key = self._run_streams(policy, params, key, group, all_rewards)

        log: Dict[str, Any] = {}
        score_groups = collections.defaultdict(list)
        for prefix, seed, r in zip(self.prefixes, self.seeds, all_rewards):
            score_groups[prefix].append(r)
            log[f"{prefix}sim_max_reward_{seed}"] = float(r)
        for prefix, rs in score_groups.items():
            log[f"{prefix}mean_score"] = float(np.mean(rs))
        return log

    def _run_streams(self, policy, params, key, group, all_rewards):
        """Interleaved rollout of one group of (start, env_fns) chunks."""
        streams = []
        try:
            for start, fns in group:
                venv = (
                    AsyncVectorEnv(fns)
                    if self.vector_env == "async"
                    else SyncVectorEnv(fns)
                )
                streams.append({
                    "start": start,
                    "venv": venv,
                    "obs": venv.reset(),
                    "done": np.zeros(len(fns), dtype=bool),
                    "max_reward": np.zeros(len(fns)),
                    "steps": 0,
                    "cache": None,
                    "pending": None,
                })

            def dispatch(s, key):
                obs_dict = {
                    "image": s["obs"]["image"].astype(np.float32),
                    "agent_pos": s["obs"]["agent_pos"].astype(np.float32),
                }
                key, sub = jax.random.split(key)
                if self.latent_cache:
                    # reuse VAE latents for the cond frames that repeat as
                    # the obs window slides by n_action_steps
                    s["pending"], s["cache"] = (
                        policy.predict_action_cached_async(
                            params, obs_dict, sub, cache=s["cache"],
                            n_shift=self.n_action_steps,
                        )
                    )
                else:
                    s["pending"] = policy.predict_action_async(
                        params, obs_dict, sub
                    )
                return key

            def finished(s):
                return s["done"].all() or s["steps"] >= self.max_steps

            for s in streams:  # fill the pipeline
                key = dispatch(s, key)
            while not all(finished(s) for s in streams):
                for s in streams:
                    if s["pending"] is None:
                        continue
                    nact = np.asarray(jax.device_get(s["pending"]))
                    s["pending"] = None
                    action = nact[:, : self.n_action_steps]
                    obs, rewards, dones, _ = s["venv"].step(action)
                    s["obs"] = obs
                    s["max_reward"] = np.maximum(s["max_reward"], rewards)
                    s["done"] |= dones
                    s["steps"] += self.n_action_steps
                    if not finished(s):
                        key = dispatch(s, key)
                for s in streams:
                    if finished(s) and s["venv"] is not None:
                        all_rewards[
                            s["start"] : s["start"] + len(s["max_reward"])
                        ] = s["max_reward"]
                        s["venv"].close()
                        s["venv"] = None
            for s in streams:
                if s["venv"] is not None:
                    all_rewards[
                        s["start"] : s["start"] + len(s["max_reward"])
                    ] = s["max_reward"]
        finally:
            for s in streams:
                if s["venv"] is not None:
                    s["venv"].close()
        return key
