#!/usr/bin/env python
"""Pin the upstream LIBERO task-map metadata into a committed manifest.

VERDICT r4 next-round #7: the `envs/benchmark.py` LIBERO_* resolvers read the
real ``libero`` package's task map, which never resolves in this environment
(optional extra not installable, zero egress) — so their mapping was
untested. This script records the task-map DATA (suite -> ordered task-name
list; pure metadata, the same way ``real_env_api_manifest.json`` pinned the
real-env API) from the reference's vendored copy
(/root/reference/unified_video_action/env/libero/benchmark/
libero_suite_task_map.py — a literal dict, extracted via ast.literal_eval,
no code imported or copied), and tests construct a fake ``libero`` package
from the manifest to drive the resolvers against it.

    python scripts/pin_libero_manifest.py \
        [--src <libero_suite_task_map.py>] [--out <manifest.json>]
"""

import argparse
import ast
import json
import os

DEFAULT_SRC = (
    "/root/reference/unified_video_action/env/libero/benchmark/"
    "libero_suite_task_map.py"
)
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "unified_video_action_tpu", "envs", "libero_manifest.json",
)


def extract_task_map(path: str) -> dict:
    tree = ast.parse(open(path).read())
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and node.targets[0].id == "libero_task_map"
        ):
            return ast.literal_eval(node.value)
    raise ValueError(f"no libero_task_map literal in {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default=DEFAULT_SRC)
    p.add_argument("--out", default=DEFAULT_OUT)
    args = p.parse_args()

    task_map = extract_task_map(args.src)
    manifest = {
        "source": args.src,
        "suites": {
            suite: {
                "n_tasks": len(tasks),
                "tasks": list(tasks),
                "bddl_files": [f"{t}.bddl" for t in tasks],
            }
            for suite, tasks in task_map.items()
        },
    }
    with open(args.out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    sizes = {s: v["n_tasks"] for s, v in manifest["suites"].items()}
    print(f"wrote {args.out}: {sizes}")


if __name__ == "__main__":
    main()
