"""Runner interface + env-runner loader.

Equivalents of the reference's ``BaseImageRunner`` (env_runner/
base_image_runner.py:1-10) and ``load_env_runner`` / ``env_rollout``
(utils/load_env.py:7-60): task-driven construction of the right rollout
harness, libero expanding into one runner per task hdf5 whose scores average
into ``test_mean_score`` (eval_sim.py:57-70)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional


class BaseImageRunner:
    def __init__(self, output_dir: Optional[str] = None):
        self.output_dir = output_dir

    def run(self, policy, params, key=None) -> Dict[str, Any]:
        raise NotImplementedError


def undo_transform_action(action, rot_tf):
    """Abs-action (…, 10) pos3+rot6d+grip -> (…, 7) pos3+axis_angle+grip for
    env stepping; dual-arm (…, 20) -> (…, 14)
    (reference robomimic_image_runner.py:368-385, shared by the libero
    runner via libero_image_runner.py:110-118,352-355)."""
    import numpy as np

    d = action.shape[-1]
    is_dual = d == 20
    a = action.reshape(*action.shape[:-1], 2, 10) if is_dual else action[..., None, :]
    pos, rot6, grip = a[..., :3], a[..., 3:9], a[..., 9:]
    rot = rot_tf.inverse(rot6)
    out = np.concatenate([pos, rot, grip], axis=-1)
    return out.reshape(*action.shape[:-1], -1)


def load_env_runner(cfg, output_dir: Optional[str] = None):
    """Instantiate the env runner(s) for cfg.task. Returns a single runner, or
    a list for libero (one per task file)."""
    task = cfg["task"]
    er_cfg = dict(task.get("env_runner", {}))
    target = er_cfg.pop("_target_", "")
    name = task.get("name", "")

    if "pusht" in name or "pusht" in target:
        from unified_video_action_tpu.runners.pusht_runner import PushTImageRunner

        return PushTImageRunner(output_dir=output_dir, **er_cfg)
    if "libero" in name or "libero" in target:
        from unified_video_action_tpu.runners.libero_runner import (
            make_libero_runners,
        )

        return make_libero_runners(output_dir=output_dir, **er_cfg)
    if "robomimic" in target or name in ("toolhang", "square", "can", "lift"):
        from unified_video_action_tpu.runners.robomimic_runner import (
            RobomimicImageRunner,
        )

        return RobomimicImageRunner(output_dir=output_dir, **er_cfg)
    raise ValueError(f"no runner for task {name!r} (target {target!r})")


def env_rollout(policy, params, runners, key=None) -> Dict[str, Any]:
    """Run one or many runners; average libero-style per-task test scores
    (reference utils/load_env.py:33-60, eval_sim.py:57-70)."""
    if not isinstance(runners, (list, tuple)):
        runners = [runners]
    log: Dict[str, Any] = {}
    test_scores: List[float] = []
    backends = set()
    for runner in runners:
        r = runner.run(policy, params, key)
        prefix = getattr(runner, "log_prefix", "")
        backends.add(getattr(runner, "env_backend", "real"))
        for k, v in r.items():
            log[prefix + k] = v
        if "test/mean_score" in r:
            test_scores.append(r["test/mean_score"])
    if test_scores:
        log["test_mean_score"] = float(sum(test_scores) / len(test_scores))
    # Every eval record self-identifies its env backend so a stub-backed
    # score (envs/stub.py: a seed schedule, independent of the policy) can
    # never be quoted as a real eval result.
    log["env_backend"] = "+".join(sorted(backends))
    if "stub" in backends:
        log["STUB_SCORES_NOT_REAL"] = True
        print(
            "=" * 70
            + "\nWARNING: one or more env runners used the 'stub' backend —"
            "\nscores below are a fixed seed schedule, NOT a policy evaluation."
            "\n" + "=" * 70
        )
    return log
