#!/usr/bin/env python
"""Live camera demo: predict hand-keypoint actions and overlay them.

Equivalent of the reference's eval_human.py (eval_human.py:35-194): keep a
rolling deque of camera frames, run ``predict_action`` on the stacked window,
and draw the predicted keypoint chunk on the live frame. The reference uses a
RealSense; this version takes any cv2 VideoCapture source (RealSense pipelines
plug in behind the same frame interface)."""

import argparse
import collections
import time


def plot_keypoints(frame, keypoints, color=(0, 255, 0)):
    """Draw a (K, 2) keypoint set scaled to the frame (reference
    eval_human.py:171-190)."""
    import cv2
    import numpy as np

    h, w = frame.shape[:2]
    pts = np.asarray(keypoints).reshape(-1, 2)
    for x, y in pts:
        cv2.circle(frame, (int(x * w), int(y * h)), 4, color, -1)
    return frame


def run_stream(
    policy,
    eval_params,
    cap,
    n_obs_steps: int = 16,
    display: bool = True,
    max_frames: int = None,
    on_frame=None,
    seed: int = 0,
):
    """Core demo loop, decoupled from cv2 windows so it runs headless.

    ``cap`` is anything with ``read() -> (ok, bgr_frame)`` (cv2.VideoCapture,
    a RealSense adapter, or a fake in tests). ``on_frame(vis, keypoints)``
    receives each overlaid frame. Returns the number of frames processed.
    """
    import collections
    import time

    import cv2
    import jax
    import numpy as np

    frames = collections.deque(maxlen=n_obs_steps)
    key = jax.random.PRNGKey(seed)
    n = 0
    while max_frames is None or n < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(cv2.resize(frame, (96, 96)), cv2.COLOR_BGR2RGB)
        frames.append(np.moveaxis(rgb.astype(np.float32) / 255.0, -1, 0))
        while len(frames) < n_obs_steps:
            frames.append(frames[-1])

        obs = {"image": np.stack(frames)[None]}
        key, sub = jax.random.split(key)
        t0 = time.time()
        result = policy.predict_action(eval_params, obs, sub)
        kp = result["action"][0, 0]  # first predicted step's keypoints
        print(f"inference {time.time() - t0:.3f}s")
        vis = plot_keypoints(frame.copy(), kp / 512.0)
        if on_frame is not None:
            on_frame(vis, kp)
        if display:
            cv2.imshow("uva_human", vis)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
        n += 1
    return n


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("--source", default="0", help="cv2 capture source")
    parser.add_argument("--n-obs-steps", type=int, default=16)
    parser.add_argument("--config-name", default="uva_human_pp")
    parser.add_argument(
        "--out", default=None,
        help="write overlaid frames to this video file instead of a window",
    )
    parser.add_argument("--max-frames", type=int, default=None)
    args = parser.parse_args(argv)

    import cv2
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")

    from unified_video_action_tpu.config import load_config
    from unified_video_action_tpu.training.workspace import TrainWorkspace
    from unified_video_action_tpu.training import checkpoint as ckpt_lib
    from unified_video_action_tpu.training.optim import make_optimizer
    from unified_video_action_tpu.training.train_state import create_train_state

    cfg = load_config(args.config_name)
    ws = TrainWorkspace(cfg, output_dir="/tmp/uva_human")
    policy = ws.policy
    params = policy.init_params(jax.random.PRNGKey(0))
    state = create_train_state(policy, params, make_optimizer())
    state, _, normalizer = ckpt_lib.load_checkpoint(args.checkpoint, state)
    if normalizer is not None:
        policy.set_normalizer(normalizer)
    eval_params = {"mar": state.ema_params, "vae": state.vae_params}

    src = int(args.source) if args.source.isdigit() else args.source
    cap = cv2.VideoCapture(src)

    writer = None
    on_frame = None
    if args.out:
        def on_frame(vis, _kp):
            nonlocal writer
            if writer is None:
                h, w = vis.shape[:2]
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h)
                )
            writer.write(vis)

    run_stream(
        policy, eval_params, cap,
        n_obs_steps=args.n_obs_steps,
        display=args.out is None,
        max_frames=args.max_frames,
        on_frame=on_frame,
    )
    if writer is not None:
        writer.release()
    cap.release()


if __name__ == "__main__":
    main()
