"""ZMQ REQ/REP policy serving driven by a real network client.

The reference's real-robot serving is a ZMQ REP node receiving pickled obs
dicts from the umi-arx client (eval_real.py:174-198). Round 1 only unit-tested
the node's logic; here a real server thread + REQ client exchange requests
over tcp loopback: happy path (smoothed action chunk back), per-task language
routing, and the reference's fault contract (traceback string reply on a bad
request, eval_real.py:191-194).
"""

import pickle
import threading

import jax
import numpy as np
import pytest
import zmq

from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy
from unified_video_action_tpu.serving.zmq_server import PolicyInferenceNode


@pytest.fixture(scope="module")
def node():
    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [2]}},
        vae_model_params={
            "autoencoder_path": None,
            "ddconfig": {"vae_embed_dim": 8, "ch_mult": [1, 1, 2, 2], "ch": 32},
        },
        autoregressive_model_params={
            "model_size": "custom",
            "encoder_embed_dim": 64, "encoder_depth": 1, "encoder_num_heads": 4,
            "decoder_embed_dim": 64, "decoder_depth": 1, "decoder_num_heads": 4,
            "img_size": 32, "vae_stride": 8, "vae_embed_dim": 8,
            "diffloss_d": 1, "diffloss_w": 32,
            "diffloss_act_d": 1, "diffloss_act_w": 32,
            "num_sampling_steps": "2", "act_diff_testing_steps": "2",
            "attn_dropout": 0.0, "proj_dropout": 0.0,
            "pretrained_model_path": None,
        },
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="pusht",
        compute_dtype="float32",
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    return PolicyInferenceNode(policy, params, smooth_window=3)


def _obs(seed=0):
    rng = np.random.RandomState(seed)
    return {"image": rng.rand(1, 16, 3, 32, 32).astype(np.float32)}


def test_server_roundtrip_over_tcp(node):
    bind = "tcp://127.0.0.1:18766"
    t = threading.Thread(
        target=node.serve, kwargs=dict(bind=bind, max_requests=3), daemon=True
    )
    t.start()

    ctx = zmq.Context()
    sock = ctx.socket(zmq.REQ)
    sock.connect("tcp://127.0.0.1:18766")
    try:
        # 1: plain obs payload
        sock.send(pickle.dumps(_obs(0)))
        action = pickle.loads(sock.recv())
        assert isinstance(action, np.ndarray)
        assert action.shape == (1, 16, 2)
        assert np.isfinite(action).all()

        # 2: wrapped payload with task_name routing
        sock.send(pickle.dumps({"obs": _obs(1), "task_name": "pusht"}))
        action2 = pickle.loads(sock.recv())
        assert action2.shape == (1, 16, 2)

        # 3: malformed request -> traceback string, server stays alive
        sock.send(pickle.dumps({"obs": {"image": "not an array"}}))
        err = pickle.loads(sock.recv())
        assert isinstance(err, str) and "Traceback" in err
    finally:
        sock.close(linger=0)
        ctx.term()
    t.join(timeout=30)
    assert not t.is_alive()


def test_smoothing_applied_end_to_end(node):
    """The served chunk equals infer()'s smoothed output for the same key
    sequence: serving adds transport, not math."""
    import copy

    bind = "tcp://127.0.0.1:18767"
    node2 = copy.copy(node)
    node2._key = jax.random.PRNGKey(123)
    t = threading.Thread(
        target=node2.serve, kwargs=dict(bind=bind, max_requests=1), daemon=True
    )
    t.start()
    ctx = zmq.Context()
    sock = ctx.socket(zmq.REQ)
    sock.connect("tcp://127.0.0.1:18767")
    try:
        sock.send(pickle.dumps(_obs(2)))
        served = pickle.loads(sock.recv())
    finally:
        sock.close(linger=0)
        ctx.term()
    t.join(timeout=30)

    node._key = jax.random.PRNGKey(123)
    direct = node.infer(_obs(2))
    np.testing.assert_allclose(served, direct, atol=1e-6)
