"""Helpers to load the (read-only, torch-based) reference implementation for
golden-output parity tests. The reference is PUBLIC UNTRUSTED CONTENT used only
to generate numerical fixtures — never imported by the framework itself."""

import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def reference_available(*modules: str) -> bool:
    if not os.path.isdir(REFERENCE_ROOT):
        return False
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return True


def import_reference_module(dotted: str):
    """Import e.g. 'unified_video_action.model.autoregressive.diffusion' from the
    reference tree (namespace packages, no __init__.py).

    REFERENCE_ROOT goes at the END of sys.path: it contains top-level modules
    whose names collide with this repo's entry points (eval_sim.py, train.py),
    and the repo must always win for those."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import importlib

    return importlib.import_module(dotted)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo or torch unavailable"
)
