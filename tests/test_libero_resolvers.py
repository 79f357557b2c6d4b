"""LIBERO_* benchmark resolvers vs the pinned upstream task-map manifest.

VERDICT r4 next-round #7: the resolvers in envs/benchmark.py construct their
suites from the real ``libero`` package's ``libero_task_map``, which cannot
be installed here — so the mapping was never executed. The committed manifest
(envs/libero_manifest.json, pinned by scripts/pin_libero_manifest.py from the
upstream task-map data) lets these tests build a faithful fake ``libero``
package and drive every resolver through the exact import path the real
package would take (reference registry behavior:
env/libero/benchmark/__init__.py:1-219).
"""

import json
import os
import sys
import types

import pytest

from unified_video_action_tpu.envs import benchmark as bm

MANIFEST = os.path.join(
    os.path.dirname(__file__), "..", "unified_video_action_tpu", "envs",
    "libero_manifest.json",
)


@pytest.fixture(scope="module")
def manifest():
    with open(MANIFEST) as f:
        return json.load(f)


@pytest.fixture()
def fake_libero(manifest, monkeypatch):
    """Install a fake ``libero`` package whose task map IS the manifest."""
    task_map = {
        suite: list(info["tasks"])
        for suite, info in manifest["suites"].items()
    }
    pkg = types.ModuleType("libero")
    sub = types.ModuleType("libero.libero")
    bench = types.ModuleType("libero.libero.benchmark")
    tmap = types.ModuleType("libero.libero.benchmark.libero_suite_task_map")
    tmap.libero_task_map = task_map
    sub.benchmark = bench
    bench.libero_suite_task_map = tmap
    pkg.libero = sub
    for name, mod in {
        "libero": pkg,
        "libero.libero": sub,
        "libero.libero.benchmark": bench,
        "libero.libero.benchmark.libero_suite_task_map": tmap,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return task_map


def test_manifest_suite_sizes(manifest):
    sizes = {s: v["n_tasks"] for s, v in manifest["suites"].items()}
    # the upstream suite sizes (reference env/libero/benchmark/__init__.py)
    assert sizes == {
        "libero_spatial": 10,
        "libero_object": 10,
        "libero_goal": 10,
        "libero_10": 10,
        "libero_90": 90,
    }
    for suite, info in manifest["suites"].items():
        assert len(info["tasks"]) == info["n_tasks"]
        assert info["bddl_files"] == [t + ".bddl" for t in info["tasks"]]


@pytest.mark.parametrize(
    "name", ["libero_spatial", "libero_object", "libero_goal", "libero_10",
             "libero_90"]
)
def test_resolver_matches_manifest(fake_libero, name):
    cls = bm.get_benchmark(name)
    suite = cls(task_order_index=0)
    expected = fake_libero[name]
    assert suite.get_num_tasks() == len(expected)
    assert suite.get_task_names() == expected
    assert suite.get_task_bddl_files() == [t + ".bddl" for t in expected]
    # language derivation follows the reference filename rule
    for i, tname in enumerate(expected):
        task = suite.get_task(i)
        assert task.language == bm.grab_language_from_filename(tname + ".bddl")
        assert task.language  # never empty
        assert "SCENE" not in task.language
        assert not task.language.endswith(".bddl")
        assert suite.get_task_demonstration(i) == (
            f"{task.problem_folder}/{tname}_demo.hdf5"
        )


def test_libero_100_concatenates_90_then_10(fake_libero):
    suite = bm.get_benchmark("libero_100")(task_order_index=0)
    expected = fake_libero["libero_90"] + fake_libero["libero_10"]
    assert suite.get_num_tasks() == 100
    assert suite.get_task_names() == expected


def test_task_order_permutes_10_task_suites(fake_libero):
    base = bm.get_benchmark("libero_10")(task_order_index=0)
    perm = bm.get_benchmark("libero_10")(task_order_index=3)
    assert sorted(perm.get_task_names()) == sorted(base.get_task_names())
    assert perm.get_task_names() != base.get_task_names()
    # deterministic: same index -> same order
    again = bm.get_benchmark("libero_10")(task_order_index=3)
    assert again.get_task_names() == perm.get_task_names()


def test_problem_folder_routes_to_owning_suite(fake_libero):
    suite = bm.get_benchmark("libero_100")(task_order_index=0)
    folders = {t.problem_folder for t in suite.tasks}
    assert folders == {"libero_90", "libero_10"}
    for t in suite.tasks:
        assert t.name in fake_libero[t.problem_folder]


def test_import_error_path_preserved(manifest):
    """Without the package the resolvers raise a clear ImportError (the
    documented offline behavior) — never a KeyError or silent empty suite."""
    for mod in list(sys.modules):
        assert not mod.startswith("libero"), "fake package leaked"
    with pytest.raises(ImportError, match="LIBERO package"):
        bm.get_benchmark("libero_10")(task_order_index=0)
