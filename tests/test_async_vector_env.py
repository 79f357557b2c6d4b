"""AsyncVectorEnv: process-per-env stepping, call_each, render, close."""

import numpy as np
import pytest

from unified_video_action_tpu.envs.wrappers import AsyncVectorEnv, MultiStepWrapper


def _make_env(seed):
    def fn():
        from unified_video_action_tpu.envs.pusht import PushTImageEnv

        env = PushTImageEnv()
        env.seed(seed)
        return MultiStepWrapper(env, n_obs_steps=2, n_action_steps=2,
                                max_episode_steps=8)
    return fn


@pytest.mark.slow
def test_async_vector_env_roundtrip():
    venv = AsyncVectorEnv([_make_env(0), _make_env(1)])
    try:
        obs = venv.reset()
        assert obs["image"].shape == (2, 2, 3, 96, 96)
        actions = np.tile(np.array([[256.0, 256.0]]), (2, 2, 1))
        obs, rewards, dones, infos = venv.step(actions)
        assert obs["agent_pos"].shape == (2, 2, 2)
        assert rewards.shape == (2,)
        # per-env calls with distinct args
        seeds = venv.call_each("seed", args_list=[[5], [6]])
        assert len(seeds) == 2
        frames = venv.render()
        assert frames[0].shape[-1] == 3
    finally:
        venv.close()
