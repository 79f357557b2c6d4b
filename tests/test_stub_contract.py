"""Contract-pin the stub seams against the recorded real-env API manifest.

The LIBERO / robosuite simulators cannot be installed here (no egress); the
runners exercise ``envs/stub.py`` fakes instead. These tests make the future
swap-in PROVABLE (VERDICT r3 item 7): the manifest
(``tests/fixtures/real_env_api_manifest.json``) records, with reference
file:line citations, the method surface the real envs expose and the
reference's own wrappers consume; here we assert

1. each stub implements every manifest method with a signature that binds
   the recorded positional arguments,
2. our runner adapters never call an env method outside the manifest (so
   the real env satisfies every call site the adapter makes), and
3. the behavioral contracts the adapters rely on hold on the stubs
   (old-gym 4-tuple step, HWC uint8 images, ``reset_to``/``get_state``
   round-trip, ``set_init_state`` regenerating obs).
"""

import ast
import inspect
import json
import os

import numpy as np
import pytest

from unified_video_action_tpu.envs.stub import StubLiberoEnv, StubRobosuiteEnv

MANIFEST = json.load(
    open(os.path.join(os.path.dirname(__file__), "fixtures",
                      "real_env_api_manifest.json"))
)
STUBS = {
    "libero.OffScreenRenderEnv": StubLiberoEnv(action_dim=7),
    "robomimic.EnvRobosuite": StubRobosuiteEnv(
        shape_meta={"obs": {"agentview_image": {"shape": [3, 84, 84]}}},
        action_dim=7,
    ),
}


@pytest.mark.parametrize("env_name", [k for k in MANIFEST if k != "_comment"])
def test_stub_implements_manifest_surface(env_name):
    stub = STUBS[env_name]
    for method, params in MANIFEST[env_name]["methods"].items():
        fn = getattr(stub, method, None)
        assert callable(fn), f"{env_name} stub missing method {method}()"
        # the recorded positional arguments must bind
        inspect.signature(fn).bind(*[object()] * len(params))


def _env_methods_called(adapter_path):
    """Every ``self.env.<name>(...)`` call inside the adapter module."""
    tree = ast.parse(open(adapter_path).read())
    called = set()
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        if (
            isinstance(f, ast.Attribute)
            and isinstance(f.value, ast.Attribute)
            and f.value.attr == "env"
            and isinstance(f.value.value, ast.Name)
            and f.value.value.id == "self"
        ):
            called.add(f.attr)
    return called


@pytest.mark.parametrize("env_name", [k for k in MANIFEST if k != "_comment"])
def test_adapter_calls_only_manifest_methods(env_name):
    spec = MANIFEST[env_name]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    called = _env_methods_called(os.path.join(repo, spec["adapter"]))
    allowed = set(spec["methods"])
    # hasattr-guarded optional calls are part of the contract too
    extra = called - allowed
    assert not extra, (
        f"{spec['adapter']} calls env methods outside the recorded real API:"
        f" {sorted(extra)} — the real {env_name} cannot satisfy them"
    )


def test_libero_stub_behavioral_contract():
    env = StubLiberoEnv(camera_heights=128, camera_widths=128, action_dim=7)
    env.seed(3)
    obs = env.reset()
    assert set(MANIFEST["libero.OffScreenRenderEnv"]["obs_keys"]) <= set(obs)
    img = obs["agentview_image"]
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8  # HWC uint8
    out = env.step(np.zeros(7, np.float32))
    assert len(out) == 4  # old-gym 4-tuple
    assert isinstance(env.check_success(), (bool, np.bool_))
    regen = env.set_init_state(np.array([0.5, 1.0, 2.0]))
    assert regen["agentview_image"].shape == (128, 128, 3)
    env.close()


def test_robosuite_stub_behavioral_contract():
    shape_meta = {
        "obs": {
            "sideview_image": {"shape": [3, 84, 84]},
            "robot0_eef_pos": {"shape": [3]},
        }
    }
    env = StubRobosuiteEnv(shape_meta=shape_meta, seed=11, action_dim=7)
    obs = env.reset()
    assert obs["sideview_image"].shape == (84, 84, 3)
    assert obs["sideview_image"].dtype == np.uint8
    assert obs["robot0_eef_pos"].shape == (3,)
    # get_state -> reset_to round trip (the reference wrapper's seed cache,
    # robomimic_image_wrapper.py:84-89)
    state = env.get_state()
    assert "states" in state
    obs2 = env.reset_to(state)
    assert obs2["sideview_image"].shape == (84, 84, 3)
    assert np.array_equal(env.init_state, state["states"])
    raw = env.get_observation()
    assert set(raw) == set(obs)
    out = env.step(np.zeros(7, np.float32))
    assert len(out) == 4
    env.close()
