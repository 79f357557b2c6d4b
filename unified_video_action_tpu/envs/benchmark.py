"""LIBERO-style benchmark registry over the executable env backends.

The reference organizes its evaluation suites through a benchmark registry
(`env/libero/benchmark/__init__.py:1-219`): a case-insensitive
``register_benchmark`` / ``get_benchmark_dict`` / ``get_benchmark`` mapping,
a ``Task`` NamedTuple (name, language, problem, problem_folder, bddl_file,
init_states_file), and a ``Benchmark`` base class exposing task enumeration
(``get_num_tasks`` / ``get_task_names`` / ``get_task``), per-task init states
(``get_task_init_states``), demonstration paths (``get_task_demonstration``)
and language-embedding plumbing (``set_task_embs`` / ``get_task_emb``).

This module is the same API over what this host can actually execute:

* ``KITCHEN`` — the 7 Franka-kitchen subtasks (real mujoco contact physics,
  native software rendering; envs/kitchen_env.py). Init states are genuine
  mujoco ``qpos``+``qvel`` vectors recorded from seeded env resets.
* ``FETCH`` — tabletop pick-and-place variants over the mujoco Fetch scene
  (envs/fetch_env.py), init states via the env's ``get_state``.
* ``LIBERO_SPATIAL`` / ``LIBERO_OBJECT`` / ``LIBERO_GOAL`` / ``LIBERO_90`` /
  ``LIBERO_10`` / ``LIBERO_100`` — thin resolvers over the upstream
  ``libero`` package's task map when that optional extra is installed
  (same construction path as the reference); a clear ImportError otherwise.

``task_order_index`` follows the reference semantics (a fixed permutation of
a 10-task suite chosen by index, used for lifelong-learning task orderings).
The reference ships a hand-rolled table of 21 permutations; here order 0 is
the identity and order ``i>0`` is the deterministic shuffle produced by
``numpy.random.RandomState(i)`` — stable across runs, no table to copy.
"""

from __future__ import annotations

import abc
import os
from typing import Dict, List, NamedTuple, Optional, Type

import numpy as np

BENCHMARK_MAPPING: Dict[str, Type["Benchmark"]] = {}


def register_benchmark(target_class):
    """Case-INsensitive registry, same contract as the reference."""
    BENCHMARK_MAPPING[target_class.__name__.lower()] = target_class
    return target_class


def get_benchmark_dict(help=False):
    if help:
        print("Available benchmarks:")
        for benchmark_name in BENCHMARK_MAPPING:
            print(f"\t{benchmark_name}")
    return BENCHMARK_MAPPING


def get_benchmark(benchmark_name: str) -> Type["Benchmark"]:
    return BENCHMARK_MAPPING[benchmark_name.lower()]


def print_benchmark():
    print(BENCHMARK_MAPPING)


class Task(NamedTuple):
    name: str
    language: str
    problem: str
    problem_folder: str
    bddl_file: str
    init_states_file: str


def grab_language_from_filename(x: str) -> str:
    """LIBERO filename -> language goal (reference rule: SCENE-prefixed
    LIBERO-100 names drop the scene prefix, lowercase suites use the whole
    stem; '.bddl' suffix trimmed)."""
    if x and x[0].isupper():  # LIBERO-100 style
        idx = x.find("SCENE")
        if idx >= 0:
            offset = 8 if "SCENE10" in x else 7
            language = " ".join(x[idx + offset:].split("_"))
        else:
            language = " ".join(x.split("_"))
    else:
        language = " ".join(x.split("_"))
    en = language.find(".bddl")
    return language[:en] if en >= 0 else language


def task_order(index: int, n_tasks: int) -> List[int]:
    """Deterministic task permutation for ``task_order_index`` semantics."""
    if index == 0:
        return list(range(n_tasks))
    perm = np.arange(n_tasks)
    np.random.RandomState(index).shuffle(perm)
    return perm.tolist()


class Benchmark(abc.ABC):
    """A benchmark: an ordered list of tasks with init states + language."""

    name: str = "benchmark"

    def __init__(self, task_order_index: int = 0):
        self.task_embs = None
        self.task_order_index = int(task_order_index)

    def _make_benchmark(self):
        tasks = self._suite_tasks()
        if len(tasks) == 10 or self.task_order_index:
            order = task_order(self.task_order_index, len(tasks))
            tasks = [tasks[i] for i in order]
        self.tasks = tasks
        self.n_tasks = len(self.tasks)

    @abc.abstractmethod
    def _suite_tasks(self) -> List[Task]:
        """The suite's tasks in canonical order."""

    # -- enumeration (reference Benchmark surface) -----------------------

    def get_num_tasks(self) -> int:
        return self.n_tasks

    def get_task_names(self) -> List[str]:
        return [task.name for task in self.tasks]

    def get_task_problems(self) -> List[str]:
        return [task.problem for task in self.tasks]

    def get_task_bddl_files(self) -> List[str]:
        return [task.bddl_file for task in self.tasks]

    def get_task(self, i: int) -> Task:
        return self.tasks[i]

    def get_task_demonstration(self, i: int) -> str:
        assert 0 <= i < self.n_tasks, (
            f"[error] task number {i} is outside of range {self.n_tasks}"
        )
        t = self.tasks[i]
        return f"{t.problem_folder}/{t.name}_demo.hdf5"

    # -- language embeddings ---------------------------------------------

    def get_task_emb(self, i: int):
        return self.task_embs[i]

    def set_task_embs(self, task_embs):
        self.task_embs = task_embs

    # -- init states + envs ------------------------------------------------

    def get_task_init_states(self, i: int, n: int = 8) -> np.ndarray:
        """(n, state_dim) real simulator states for reproducible eval
        resets — recorded from seeded resets of the task's real env."""
        env = self.make_task_env(i)
        try:
            states = []
            for k in range(n):
                env.seed(1000 * i + k)
                env.reset()
                states.append(np.asarray(self._env_state(env), np.float64))
            return np.stack(states)
        finally:
            env.close()

    @staticmethod
    def _env_state(env) -> np.ndarray:
        if hasattr(env, "get_sim_state"):
            return env.get_sim_state()
        return env.get_state()["states"]

    def make_task_env(self, i: int, camera_heights: int = 128,
                      camera_widths: int = 128):
        """Construct the executable env for task ``i`` (real physics)."""
        raise NotImplementedError(
            f"{type(self).__name__} has no executable env backend on this host"
        )


# --------------------------------------------------------------------------
# Executable suites (real mujoco physics on this host)
# --------------------------------------------------------------------------


@register_benchmark
class KITCHEN(Benchmark):
    """Franka-kitchen suite: 7 language-conditioned subtasks, real physics."""

    def __init__(self, task_order_index: int = 0):
        super().__init__(task_order_index=task_order_index)
        self.name = "kitchen"
        self._make_benchmark()

    def _suite_tasks(self) -> List[Task]:
        from unified_video_action_tpu.envs.kitchen_env import (
            KITCHEN_TASK_PROMPTS,
            _slug,
        )

        return [
            Task(
                name=f"kitchen_{_slug(t)}",
                language=prompt,
                problem="FrankaKitchen",
                problem_folder="kitchen",
                bddl_file="",  # kitchen tasks are predicate-, not BDDL-defined
                init_states_file=f"kitchen_{_slug(t)}.init",
            )
            for t, prompt in KITCHEN_TASK_PROMPTS.items()
        ]

    def make_task_env(self, i, camera_heights=128, camera_widths=128):
        from unified_video_action_tpu.envs.kitchen_env import KitchenImageEnv

        subtask = self.tasks[i].name[len("kitchen_"):].replace("_", " ")
        return KitchenImageEnv(
            tasks=[subtask],
            camera_heights=camera_heights,
            camera_widths=camera_widths,
        )


@register_benchmark
class FETCH(Benchmark):
    """Mujoco Fetch tabletop suite (pick-and-place family)."""

    TASKS = (
        ("fetch_pick_and_place", "pick up the block and move it to the goal",
         "FetchPickAndPlace-v4"),
        ("fetch_push", "push the block to the goal", "FetchPush-v4"),
    )

    def __init__(self, task_order_index: int = 0):
        super().__init__(task_order_index=task_order_index)
        self.name = "fetch"
        self._make_benchmark()

    def _suite_tasks(self) -> List[Task]:
        return [
            Task(
                name=name,
                language=lang,
                problem="Fetch",
                problem_folder="fetch",
                bddl_file="",
                init_states_file=f"{name}.init",
            )
            for name, lang, _env_id in self.TASKS
        ]

    def make_task_env(self, i, camera_heights=84, camera_widths=84):
        from unified_video_action_tpu.envs.fetch_env import FetchImageEnv

        name = self.tasks[i].name
        env_id = dict((n, e) for n, _l, e in self.TASKS)[name]
        return FetchImageEnv(
            env_id=env_id,
            camera_heights=camera_heights,
            camera_widths=camera_widths,
        )

    @staticmethod
    def _env_state(env) -> np.ndarray:
        return env.get_state()["states"]


# --------------------------------------------------------------------------
# Upstream LIBERO suites (optional extra; resolved when the package exists)
# --------------------------------------------------------------------------


class _UpstreamLiberoBenchmark(Benchmark):
    """Resolves tasks through the installed ``libero`` package (the same
    source of truth as the reference's registry)."""

    def __init__(self, task_order_index: int = 0):
        super().__init__(task_order_index=task_order_index)
        self.name = type(self).__name__.lower()
        self._make_benchmark()

    def _suite_tasks(self) -> List[Task]:
        try:
            from libero.libero.benchmark.libero_suite_task_map import (
                libero_task_map,
            )
        except ImportError as e:  # pragma: no cover - optional heavy extra
            raise ImportError(
                f"benchmark {self.name!r} needs the LIBERO package "
                "(optional extra not installed in this environment)"
            ) from e
        suites = (
            ["libero_90", "libero_10"]
            if self.name == "libero_100"
            else [self.name]
        )
        tasks = []
        for suite in suites:
            for task in libero_task_map[suite]:
                tasks.append(
                    Task(
                        name=task,
                        language=grab_language_from_filename(task + ".bddl"),
                        problem="Libero",
                        problem_folder=suite,
                        bddl_file=f"{task}.bddl",
                        init_states_file=f"{task}.pruned_init",
                    )
                )
        return tasks

    def get_task_init_states(self, i: int, n: int = 8) -> np.ndarray:
        from libero.libero import get_libero_path  # pragma: no cover
        import torch  # pragma: no cover

        path = os.path.join(
            get_libero_path("init_states"),
            self.tasks[i].problem_folder,
            self.tasks[i].init_states_file,
        )
        return np.asarray(torch.load(path))  # pragma: no cover

    def make_task_env(self, i, camera_heights=128, camera_widths=128):
        from libero.libero import get_libero_path  # pragma: no cover
        from libero.libero.envs import OffScreenRenderEnv  # pragma: no cover

        bddl = os.path.join(
            get_libero_path("bddl_files"),
            self.tasks[i].problem_folder,
            self.tasks[i].bddl_file,
        )
        return OffScreenRenderEnv(  # pragma: no cover
            bddl_file_name=bddl,
            camera_heights=camera_heights,
            camera_widths=camera_widths,
        )


@register_benchmark
class LIBERO_SPATIAL(_UpstreamLiberoBenchmark):
    pass


@register_benchmark
class LIBERO_OBJECT(_UpstreamLiberoBenchmark):
    pass


@register_benchmark
class LIBERO_GOAL(_UpstreamLiberoBenchmark):
    pass


@register_benchmark
class LIBERO_90(_UpstreamLiberoBenchmark):
    pass


@register_benchmark
class LIBERO_10(_UpstreamLiberoBenchmark):
    pass


@register_benchmark
class LIBERO_100(_UpstreamLiberoBenchmark):
    pass
