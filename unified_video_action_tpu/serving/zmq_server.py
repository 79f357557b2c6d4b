"""ZMQ REP policy inference server.

Equivalent of the reference's real-robot serving node (eval_real.py:66-214):
bind a REP socket, receive pickled obs dicts, run ``predict_action`` with the
per-task language latent, smooth the action chunk with a moving average, and
reply with the action array (or a traceback string on error, matching the
reference's fault behavior at eval_real.py:191-194).

TPU-native: the policy path is one jitted program, so per-request latency is a
single device dispatch; the first request triggers compilation (pre-warm with
``serve(warmup=True)``).
"""

from __future__ import annotations

import pickle
import time
import traceback
from typing import Any, Dict, Optional

import numpy as np


def smooth_action(actions: np.ndarray, window: int = 3) -> np.ndarray:
    """Centered moving average over the chunk's time axis, edges replicated
    (reference smooth_action, eval_real.py:37-64)."""
    actions = np.asarray(actions)
    T = actions.shape[-2]
    pad = window // 2
    padded = np.concatenate(
        [np.repeat(actions[..., :1, :], pad, axis=-2), actions,
         np.repeat(actions[..., -1:, :], pad, axis=-2)],
        axis=-2,
    )
    out = np.empty_like(actions)
    for t in range(T):
        out[..., t, :] = padded[..., t : t + window, :].mean(axis=-2)
    return out


class PolicyInferenceNode:
    def __init__(
        self,
        policy,
        params,
        language_latents: Optional[Dict[str, np.ndarray]] = None,
        smooth_window: int = 3,
        seed: int = 0,
    ):
        self.policy = policy
        self.params = params
        self.language_latents = language_latents or {}
        self.smooth_window = smooth_window
        import jax

        self._key = jax.random.PRNGKey(seed)

    def infer(self, obs_dict: Dict[str, Any], task_name: Optional[str] = None):
        import jax

        self._key, sub = jax.random.split(self._key)
        goal = self.language_latents.get(task_name) if task_name else None
        result = self.policy.predict_action(
            self.params, obs_dict, sub, language_goal=goal
        )
        action = np.asarray(result["action_pred"])
        if self.smooth_window > 1:
            action = smooth_action(action, self.smooth_window)
        return action

    def warmup(self, obs_dict: Dict[str, Any]) -> float:
        t0 = time.time()
        self.infer(obs_dict)
        return time.time() - t0

    def serve(
        self,
        bind: str = "tcp://0.0.0.0:8766",
        max_requests: Optional[int] = None,
    ) -> None:
        """REQ/REP loop. ``max_requests`` bounds the loop (tests/drain);
        production serving passes None and runs until killed, like the
        reference node (eval_real.py:174-198)."""
        import zmq

        ctx = zmq.Context()
        socket = ctx.socket(zmq.REP)
        socket.bind(bind)
        print(f"policy server listening on {bind}")
        served = 0
        try:
            while max_requests is None or served < max_requests:
                msg = socket.recv()
                try:
                    payload = pickle.loads(msg)
                    obs_dict = payload["obs"] if "obs" in payload else payload
                    task_name = (
                        payload.get("task_name")
                        if isinstance(payload, dict)
                        else None
                    )
                    t0 = time.time()
                    action = self.infer(obs_dict, task_name)
                    print(f"request served in {time.time() - t0:.4f}s")
                    socket.send(pickle.dumps(action))
                except Exception:
                    socket.send(pickle.dumps(traceback.format_exc()))
                served += 1
        finally:
            socket.close(linger=0)
            ctx.term()
