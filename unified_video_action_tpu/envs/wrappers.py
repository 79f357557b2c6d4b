"""Environment vectorization and multi-step wrappers.

Equivalents of the reference's forked gym utilities (SURVEY.md §2.7):
* ``MultiStepWrapper`` (gym_util/multistep_wrapper.py:73-183): stacks the last
  n observations, steps an n-action chunk with early termination, aggregates
  reward with max.
* ``AsyncVectorEnv`` (gym_util/async_vector_env.py:43-668): one process per
  env over pipes with ``call_each`` (per-env function calls) and ``render``;
  autoreset disabled. Re-built here on multiprocessing with dill-serialized
  env factories; a ``SyncVectorEnv`` twin runs in-process for tests/debug.
"""

from __future__ import annotations

import collections
import multiprocessing as mp
from typing import Any, Callable, Dict, List, Optional, Sequence

import dill
import numpy as np


def stack_repeated(x, n):
    return np.repeat(np.expand_dims(x, axis=0), n, axis=0)


def _stack_last_n(deque_obs, n_steps):
    """Stack the last n observations, replicating the oldest to fill the
    window at episode start (reference stack_last_n_obs semantics)."""
    assert len(deque_obs) > 0
    items = list(deque_obs)[-n_steps:]
    while len(items) < n_steps:
        items.insert(0, items[0])
    if isinstance(items[0], dict):
        return {k: np.stack([o[k] for o in items], axis=0) for k in items[0]}
    return np.stack(items, axis=0)


class MultiStepWrapper:
    """Obs stacking + action chunk stepping (reference semantics: reward
    aggregation 'max', done = any, early exit on termination)."""

    def __init__(
        self,
        env,
        n_obs_steps: int,
        n_action_steps: int,
        max_episode_steps: Optional[int] = None,
        reward_agg_method: str = "max",
    ):
        self.env = env
        self.n_obs_steps = n_obs_steps
        self.n_action_steps = n_action_steps
        self.max_episode_steps = max_episode_steps
        self.reward_agg_method = reward_agg_method
        self.obs: collections.deque = collections.deque(maxlen=n_obs_steps + 1)
        self.reward: List[float] = []
        self.done: List[bool] = []
        self.info: collections.defaultdict = collections.defaultdict(
            lambda: collections.deque(maxlen=n_obs_steps + 1)
        )
        self._elapsed = 0

    def reset(self):
        obs, _ = self.env.reset()
        self.obs = collections.deque([obs], maxlen=self.n_obs_steps + 1)
        self.reward = []
        self.done = []
        self.info = collections.defaultdict(
            lambda: collections.deque(maxlen=self.n_obs_steps + 1)
        )
        self._elapsed = 0
        return _stack_last_n(self.obs, self.n_obs_steps)

    def step(self, action_chunk):
        """action_chunk: (n_action_steps, action_dim)."""
        for act in action_chunk:
            if len(self.done) > 0 and self.done[-1]:
                # termination
                break
            observation, reward, terminated, truncated, info = self.env.step(act)
            self.obs.append(observation)
            self.reward.append(reward)
            self._elapsed += 1
            done = terminated
            if (
                self.max_episode_steps is not None
                and self._elapsed >= self.max_episode_steps
            ):
                done = True
            self.done.append(done)
            self._add_info(info)

        observation = _stack_last_n(self.obs, self.n_obs_steps)
        reward = self._agg_reward()
        done = bool(np.any(self.done))
        info = dict(self.info)
        return observation, reward, done, info

    def _agg_reward(self):
        if not self.reward:
            return 0.0
        if self.reward_agg_method == "max":
            return float(np.max(self.reward))
        if self.reward_agg_method == "sum":
            return float(np.sum(self.reward))
        return float(self.reward[-1])

    def _add_info(self, info):
        for k, v in info.items():
            self.info[k].append(v)

    def render(self, *args, **kwargs):
        return self.env.render(*args, **kwargs)

    def seed(self, seed=None):
        return self.env.seed(seed)

    def get_rewards(self):
        return self.reward

    def get_attr(self, name):
        return getattr(self, name)

    def run_dill_function(self, dill_fn_bytes):
        fn = dill.loads(dill_fn_bytes)
        return fn(self)

    def close(self):
        self.env.close()


class _VideoRecordingMixin:
    pass


def _worker(remote, parent_remote, env_fn_bytes):
    parent_remote.close()
    env = dill.loads(env_fn_bytes)()
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "reset":
                remote.send(env.reset())
            elif cmd == "step":
                remote.send(env.step(data))
            elif cmd == "render":
                remote.send(env.render(*data[0], **data[1]))
            elif cmd == "call":
                name, args, kwargs = data
                fn = getattr(env, name)
                remote.send(fn(*args, **kwargs) if callable(fn) else fn)
            elif cmd == "close":
                env.close()
                remote.close()
                break
    except (KeyboardInterrupt, EOFError):
        pass


class AsyncVectorEnv:
    """Process-per-env vector env over pipes; dill'd factories so seeded
    closures travel (the reference dill-serializes init fns the same way)."""

    def __init__(self, env_fns: Sequence[Callable[[], Any]], context: str = "spawn"):
        ctx = mp.get_context(context)
        self.n_envs = len(env_fns)
        self.remotes, self.work_remotes = zip(
            *[ctx.Pipe() for _ in range(self.n_envs)]
        )
        self.procs = []
        for wr, r, fn in zip(self.work_remotes, self.remotes, env_fns):
            p = ctx.Process(
                target=_worker, args=(wr, r, dill.dumps(fn)), daemon=True
            )
            p.start()
            wr.close()
            self.procs.append(p)
        self._closed = False

    def reset(self):
        for r in self.remotes:
            r.send(("reset", None))
        return _collate([r.recv() for r in self.remotes])

    def step(self, actions):
        for r, a in zip(self.remotes, actions):
            r.send(("step", a))
        results = [r.recv() for r in self.remotes]
        obs, rewards, dones, infos = zip(*results)
        return _collate(list(obs)), np.asarray(rewards), np.asarray(dones), list(infos)

    def render(self, *args, **kwargs):
        for r in self.remotes:
            r.send(("render", (args, kwargs)))
        return [r.recv() for r in self.remotes]

    def call(self, name, *args, **kwargs):
        for r in self.remotes:
            r.send(("call", (name, args, kwargs)))
        return [r.recv() for r in self.remotes]

    def call_each(self, name, args_list=None, kwargs_list=None):
        args_list = args_list or [[]] * self.n_envs
        kwargs_list = kwargs_list or [{}] * self.n_envs
        for r, a, kw in zip(self.remotes, args_list, kwargs_list):
            r.send(("call", (name, a, kw)))
        return [r.recv() for r in self.remotes]

    def close(self):
        if self._closed:
            return
        for r in self.remotes:
            try:
                r.send(("close", None))
            except BrokenPipeError:
                pass
        for p in self.procs:
            p.join(timeout=5)
        self._closed = True


class SyncVectorEnv:
    """In-process twin of AsyncVectorEnv (tests / debug / single-host TPU
    loops where process startup costs dominate)."""

    def __init__(self, env_fns: Sequence[Callable[[], Any]]):
        self.envs = [fn() for fn in env_fns]
        self.n_envs = len(self.envs)

    def reset(self):
        return _collate([e.reset() for e in self.envs])

    def step(self, actions):
        results = [e.step(a) for e, a in zip(self.envs, actions)]
        obs, rewards, dones, infos = zip(*results)
        return _collate(list(obs)), np.asarray(rewards), np.asarray(dones), list(infos)

    def render(self, *args, **kwargs):
        return [e.render(*args, **kwargs) for e in self.envs]

    def call(self, name, *args, **kwargs):
        out = []
        for e in self.envs:
            fn = getattr(e, name)
            out.append(fn(*args, **kwargs) if callable(fn) else fn)
        return out

    def call_each(self, name, args_list=None, kwargs_list=None):
        args_list = args_list or [[]] * self.n_envs
        kwargs_list = kwargs_list or [{}] * self.n_envs
        out = []
        for e, a, kw in zip(self.envs, args_list, kwargs_list):
            fn = getattr(e, name)
            out.append(fn(*a, **kw) if callable(fn) else fn)
        return out

    def close(self):
        for e in self.envs:
            e.close()


def _collate(items):
    """Stack a list of (possibly dict) observations into batched arrays."""
    if isinstance(items[0], dict):
        return {k: _collate([it[k] for it in items]) for k in items[0]}
    return np.stack(items, axis=0)
