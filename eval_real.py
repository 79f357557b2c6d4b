#!/usr/bin/env python
"""Real-robot policy inference server.

Equivalent of the reference's eval_real.py (eval_real.py:66-214): load a
checkpoint, force 100 sampling steps (deploy convention, eval_real.py:79-89),
select per-task CLIP language latents, and serve ``predict_action`` over a
ZMQ REP socket with moving-average action smoothing. The robot-side client
(cameras + controllers) connects over TCP as in the reference's umi-arx split.
"""

import argparse
import os
import pickle


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("--bind", default="tcp://0.0.0.0:8766")
    parser.add_argument("--language-latents", default=None,
                        help="pickle of {task_name: (512,) latent}")
    parser.add_argument("--smooth-window", type=int, default=3)
    parser.add_argument("--config-name", default="uva_pusht")
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from unified_video_action_tpu.config import load_config
    from unified_video_action_tpu.training.workspace import TrainWorkspace
    from unified_video_action_tpu.training import checkpoint as ckpt_lib
    from unified_video_action_tpu.training.optim import make_optimizer
    from unified_video_action_tpu.training.train_state import create_train_state
    from unified_video_action_tpu.serving.zmq_server import PolicyInferenceNode

    cfg = load_config(
        args.config_name,
        overrides=[
            # deploy convention: 100-step samplers regardless of training cfg
            "model.policy.autoregressive_model_params.num_sampling_steps='100'",
            "model.policy.autoregressive_model_params.act_diff_testing_steps='100'",
        ],
    )
    ws = TrainWorkspace(cfg, output_dir="/tmp/uva_serve")
    policy = ws.policy
    params = policy.init_params(jax.random.PRNGKey(0))
    state = create_train_state(policy, params, make_optimizer())
    state, meta, normalizer = ckpt_lib.load_checkpoint(args.checkpoint, state)
    if normalizer is not None:
        policy.set_normalizer(normalizer)
    eval_params = {"mar": state.ema_params, "vae": state.vae_params}

    latents = None
    if args.language_latents and os.path.exists(args.language_latents):
        with open(args.language_latents, "rb") as f:
            latents = pickle.load(f)

    node = PolicyInferenceNode(
        policy, eval_params, language_latents=latents,
        smooth_window=args.smooth_window,
    )
    node.serve(args.bind)


if __name__ == "__main__":
    main()
