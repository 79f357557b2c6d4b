#!/usr/bin/env python
"""Training entry point.

Equivalent of the reference's hydra CLI (train.py:26-68):

    python train.py --config-name=uva_pusht training.debug=true k=v ...

Dotted overrides follow hydra syntax; ``--config-name`` selects the top-level
yaml under unified_video_action_tpu/config/yaml/.
"""

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="uva_pusht")
    parser.add_argument("--config-root", default=None)
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    # persistent compilation cache: repeated runs (and the 5 per-task-mode
    # train programs) skip the expensive XLA compiles
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("UVA_COMPILE_CACHE", "/tmp/uva_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from unified_video_action_tpu.config import CONFIG_ROOT, instantiate, load_config

    cfg = load_config(
        args.config_name,
        overrides=args.overrides,
        config_root=args.config_root or CONFIG_ROOT,
    )

    # video-only runs (stage 1) have no rollout score to monitor: switch the
    # top-k checkpointer to the video-quality metric, as the reference does
    # (train.py:35-41 forces FVD monitoring when predict_action=False). The
    # monitored key is the VAE-latent Fréchet — the deterministic fallback
    # that exists without I3D weights (eval/metrics.vae_latent_embeddings).
    ap = (
        cfg.get("model", {}).get("policy", {}).get("action_model_params", {})
        or {}
    )
    monitor = cfg.get("checkpoint", {}).get("topk", {}).get("monitor_key")
    if not ap.get("predict_action", True) and monitor == "test_mean_score":
        topk = cfg["checkpoint"]["topk"]
        topk["monitor_key"] = "video_fvd_vae"
        topk["mode"] = "min"
        topk["format_str"] = "epoch={epoch:04d}-video_fvd_vae={video_fvd_vae:.3f}"

    # multi-host: `distributed.coordinator=<host:port> distributed.num_processes=N
    # distributed.process_id=i` overrides, or the standard cluster env vars
    # (jax.distributed auto-detection) when a coordinator address is present
    # in the environment
    dist = cfg.get("distributed", {}) or {}
    env_coord = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "JAX_COORDINATOR_IP")
    )
    if dist.get("num_processes") or dist.get("coordinator") or env_coord:
        from unified_video_action_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=dist.get("coordinator"),
            num_processes=(
                int(dist["num_processes"]) if dist.get("num_processes") else None
            ),
            process_id=(
                int(dist["process_id"]) if dist.get("process_id") is not None else None
            ),
        )

    output_dir = cfg.get("output_dir", "data/outputs/run")
    os.makedirs(output_dir, exist_ok=True)

    from unified_video_action_tpu.training.workspace import TrainWorkspace

    workspace = TrainWorkspace(cfg, output_dir=output_dir)
    metrics = workspace.run()
    print("final:", metrics)


if __name__ == "__main__":
    main()
