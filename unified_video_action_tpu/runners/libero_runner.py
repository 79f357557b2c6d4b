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
        abs_action: bool = True,
        env_backend: str = "libero",
        **kwargs,
    ):
        super().__init__(output_dir)
        self.abs_action = abs_action
        if abs_action:
            from unified_video_action_tpu.utils.rotation import RotationTransformer

            self.rot_tf = RotationTransformer("axis_angle", "rotation_6d")
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
        if env_backend not in ("libero", "stub", "kitchen"):
            raise ValueError(f"unknown env_backend {env_backend!r}")
        self.env_backend = env_backend
        if env_backend == "kitchen":
            # real mujoco physics + native software rendering
            # (envs/kitchen_env.py); task resolved from the dataset name
            from unified_video_action_tpu.envs.kitchen_env import (
                KITCHEN_TASK_PROMPTS,
                task_from_name,
            )

            self.kitchen_task = kwargs.get("kitchen_task") or task_from_name(
                dataset_path
            )
            if self.kitchen_task is None:
                raise ValueError(
                    f"cannot resolve a kitchen task from {dataset_path!r}"
                )
            self.language_goal = KITCHEN_TASK_PROMPTS[self.kitchen_task]
            # kitchen actions are 9-dim joint velocities, not pose+rot6d
            self.abs_action = False

    def _make_raw_env(self):
        if self.env_backend == "kitchen":
            from unified_video_action_tpu.envs.kitchen_env import KitchenImageEnv

            return KitchenImageEnv(
                tasks=[self.kitchen_task], camera_heights=128, camera_widths=128
            )
        if self.env_backend == "stub":
            from unified_video_action_tpu.envs.stub import StubLiberoEnv

            return StubLiberoEnv(camera_heights=128, camera_widths=128)
        _require_libero()
        from libero.libero.envs import OffScreenRenderEnv

        return OffScreenRenderEnv(
            bddl_file_name=self.bddl_file, camera_heights=128, camera_widths=128
        )

    def _make_env_fns(self):
        fns = []
        for i in range(self.n_test):
            seed = self.test_start_seed + i

            def make(seed=seed):
                env = self._make_raw_env()
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
                env_action = action
                if self.abs_action:  # rot6d -> axis-angle (:352-355)
                    from unified_video_action_tpu.runners.base import (
                        undo_transform_action,
                    )

                    env_action = undo_transform_action(action, self.rot_tf)
                obs, rewards, dones, infos = venv.step(env_action)
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


#: libero-10 task names (reference env/libero benchmark suite), used to name
#: stub-backend runners when no dataset hdf5s are staged locally.
LIBERO10_TASK_NAMES = (
    "LIVING_ROOM_SCENE2_put_both_the_alphabet_soup_and_the_tomato_sauce_in_the_basket_demo",
    "LIVING_ROOM_SCENE2_put_both_the_cream_cheese_box_and_the_butter_in_the_basket_demo",
    "KITCHEN_SCENE3_turn_on_the_stove_and_put_the_moka_pot_on_it_demo",
    "KITCHEN_SCENE4_put_the_black_bowl_in_the_bottom_drawer_of_the_cabinet_and_close_it_demo",
    "LIVING_ROOM_SCENE5_put_the_white_mug_on_the_left_plate_and_put_the_yellow_and_white_mug_on_the_right_plate_demo",
    "STUDY_SCENE1_pick_up_the_book_and_place_it_in_the_back_compartment_of_the_caddy_demo",
    "LIVING_ROOM_SCENE6_put_the_white_mug_on_the_plate_and_put_the_chocolate_pudding_to_the_right_of_the_plate_demo",
    "LIVING_ROOM_SCENE1_put_both_the_alphabet_soup_and_the_cream_cheese_box_in_the_basket_demo",
    "KITCHEN_SCENE8_put_both_moka_pots_on_the_stove_demo",
    "KITCHEN_SCENE6_put_the_yellow_and_white_mug_in_the_microwave_and_close_it_demo",
)


def make_libero_runners(
    dataset_dir: Optional[str] = None,
    output_dir: Optional[str] = None,
    env_backend: str = "libero",
    **kwargs,
) -> List[LiberoImageRunner]:
    files = sorted(glob.glob(os.path.join(dataset_dir or "", "*.hdf5")))
    if not files and env_backend == "stub":
        files = [name + ".hdf5" for name in LIBERO10_TASK_NAMES]
    if not files and env_backend == "kitchen":
        from unified_video_action_tpu.envs.kitchen_env import (
            KITCHEN_TASK_PROMPTS,
            _slug,
        )

        files = [
            f"kitchen_{_slug(t)}_demo.hdf5" for t in KITCHEN_TASK_PROMPTS
        ]
    return [
        LiberoImageRunner(path, output_dir=output_dir, env_backend=env_backend,
                          **kwargs)
        for path in files
    ]
