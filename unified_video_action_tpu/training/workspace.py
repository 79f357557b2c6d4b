"""Training workspace — the full train loop.

Equivalent of the reference's ``TrainUnifiedVideoActionWorkspace``
(workspace/train_unified_video_action_workspace.py:41-422): builds policy +
dataset + loaders, fits/loads the normalizer, runs the epoch loop with
per-batch random task-mode choice, EMA, cosine-warmup LR, grad accumulation,
periodic validation (action-L2), env rollouts, latest + top-k checkpoints, and
debug-mode shrinkage (train.py:46-56 semantics).

TPU-native: one jitted train step per task mode (batch sharded over the mesh's
data axis, params replicated), no gradient hacks for unused params (each mode
compiles its own program, and AdamW updates every param regardless of zero
grads — matching the reference's zero-grad workaround semantics)."""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from unified_video_action_tpu.config import Cfg, instantiate, register
from unified_video_action_tpu.data.loader import DataLoader
from unified_video_action_tpu.parallel import mesh as mesh_lib
from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy
from unified_video_action_tpu.training import checkpoint as ckpt_lib
from unified_video_action_tpu.training.ema import EmaConfig
from unified_video_action_tpu.training.optim import make_optimizer
from unified_video_action_tpu.training.train_state import (
    create_train_state,
    make_train_step,
)
from unified_video_action_tpu.utils import frames as frame_util


class TrainWorkspace:
    def __init__(self, cfg: Cfg, output_dir: Optional[str] = None):
        self.cfg = cfg
        self.output_dir = output_dir or cfg.get("output_dir", "outputs/run")
        seed = int(cfg["training"]["seed"])
        self.seed = seed
        self.np_rng = np.random.default_rng(seed)

        # hydra packaging: the model yaml composes under cfg.model (reference
        # accesses cfg.model.policy throughout)
        policy_cfg = dict(cfg["model"]["policy"] if "model" in cfg else cfg["policy"])
        policy_cfg.pop("_target_", None)
        optimizer_cfg = policy_cfg.pop("optimizer", {})
        task = cfg.get("task", {})
        self.policy = UnifiedVideoActionPolicy(
            task_name=task.get("name", policy_cfg.pop("task_name", "pusht")),
            task_modes=tuple(task.get("task_modes", ())),
            normalizer_type=task.get("dataset", {}).get("normalizer_type", "all"),
            optimizer=optimizer_cfg,
            **policy_cfg,
        )
        self.epoch = 0
        self.global_step = 0

    # ------------------------------------------------------------------

    def run(self) -> Dict[str, Any]:
        # Preemption safety (TPU spot/maintenance events deliver SIGTERM):
        # installed FIRST so a signal during the long dataset/jit setup is
        # also caught — the epoch loop then exits immediately and the final
        # checkpoint save still runs. The reference has no equivalent
        # (SURVEY §5.3).
        import os as _os
        import signal as _signal
        import threading as _threading

        preempted = {"flag": False}
        prev_handlers = {}
        # Events the handler sets so blocked data-path waits unblock promptly
        # (populated once the loaders exist); and a watchdog so a step wedged
        # inside a non-returning runtime call (a dead device tunnel, a hung
        # collective) can never outlive the preemption grace window — the
        # orderly path saves a checkpoint and disarms; otherwise we force-exit
        # and the supervisor resumes from the last epoch checkpoint. Observed
        # in the round-4 UMI chip drive: SIGTERM mid-epoch with the step
        # pipeline blocked left the process alive 15 min until SIGKILL.
        preempt_stop_events = []
        shutdown_done = _threading.Event()

        def _watchdog():
            grace = float(_os.environ.get("UVA_PREEMPT_GRACE_S", "600"))
            if not shutdown_done.wait(grace):
                print(
                    f"[preempt] orderly shutdown did not finish within "
                    f"{grace:.0f}s grace; forcing exit (resume will replay "
                    f"from the last epoch checkpoint)",
                    flush=True,
                )
                _os._exit(75)  # EX_TEMPFAIL: retryable
            # The checkpoint is durable now, but interpreter exit can still
            # hang (tracker/logger close, atexit joins on wedged threads or
            # children). Nothing useful happens after this point — bound it.
            import time as _time

            _time.sleep(float(_os.environ.get("UVA_EXIT_GRACE_S", "120")))
            print("[preempt] teardown lingered after checkpoint commit; "
                  "forcing clean exit", flush=True)
            _os._exit(0)

        def _on_preempt(signum, frame):
            first = not preempted["flag"]
            preempted["flag"] = True
            for ev in preempt_stop_events:
                ev.set()
            if first:
                _threading.Thread(target=_watchdog, daemon=True).start()

        for sig in (_signal.SIGTERM, _signal.SIGINT):
            try:
                prev_handlers[sig] = _signal.signal(sig, _on_preempt)
            except (ValueError, OSError):  # non-main thread / unsupported
                prev_handlers.pop(sig, None)

        cfg = self.cfg
        tcfg = cfg["training"]
        debug = bool(tcfg.get("debug", False))

        num_epochs = 2 if debug else int(tcfg["num_epochs"])
        max_train_steps = 3 if debug else tcfg.get("max_train_steps")
        max_val_steps = 3 if debug else tcfg.get("max_val_steps")
        # cadences <= 0 mean "never" (the modulo fires at epoch 0 otherwise,
        # so e.g. rollout_every=1000 on a 2-epoch run still rolls out once —
        # which is how the round-4 mar_base@256 viability matrix mistook an
        # eval-phase OOM for a training one)
        rollout_every = 1 if debug else int(tcfg.get("rollout_every", 10))
        checkpoint_every = 1 if debug else int(tcfg.get("checkpoint_every", 10))
        val_every = 1 if debug else int(tcfg.get("val_every", 1))
        # Early stopping on the rollout score (units: consecutive rollout
        # evals without a new best test_mean_score). Long imitation runs
        # overfit past the peak (TRAINRUN.md: peak at epoch 8, then decay);
        # patience keeps the run from burning chip-hours past it while top-k
        # keeps the best weights either way.
        early_stop_patience = tcfg.get("early_stop_patience") or None
        if early_stop_patience is not None:
            early_stop_patience = int(early_stop_patience)
        early = {"best": float("-inf"), "stale": 0, "stop": False}
        # Rollout-free runs (rollout_every<=0, e.g. stage-1 video pretrain)
        # fall back to the topk monitor metric for patience — "train stage 1
        # to convergence (FVD-vae plateau, not a fixed epoch count)"
        # (VERDICT r4 next-round #3). The sign is normalized so "higher is
        # better" internally regardless of the monitor's mode.
        topk_cfg0 = dict(cfg.get("checkpoint", {}).get("topk", {}) or {})
        early_monitor = topk_cfg0.get("monitor_key", "test_mean_score")
        early_sign = -1.0 if topk_cfg0.get("mode", "max") == "min" else 1.0

        # dataset (instantiated from its _target_ via the registry)
        ds_cfg = dict(cfg["task"]["dataset"])
        target = ds_cfg.pop(
            "_target_",
            "unified_video_action_tpu.data.pusht_dataset.PushTImageDataset",
        )
        ds_cfg.pop("language_emb_model", None)
        ds_cfg.pop("dataset_type", None)
        ds_cfg.pop("normalizer_type", None)
        from unified_video_action_tpu.config import get_class

        dataset = get_class(target)(**ds_cfg)
        val_dataset = dataset.get_validation_dataset()
        normalizer = dataset.get_normalizer()
        self.policy.set_normalizer(normalizer)

        batch_size = 2 if debug else int(cfg["dataloader"]["batch_size"])
        worker_mode = cfg["dataloader"].get("worker_mode", "thread")
        loader_prefetch = int(cfg["dataloader"].get("prefetch", 2))
        loader = DataLoader(
            dataset, batch_size, shuffle=True, seed=self.seed,
            num_workers=int(cfg["dataloader"].get("num_workers", 4)),
            worker_mode=worker_mode, prefetch=loader_prefetch,
        )
        val_loader = DataLoader(
            val_dataset, batch_size, shuffle=False, drop_last=False,
            num_workers=2, worker_mode=worker_mode, prefetch=loader_prefetch,
        )
        preempt_stop_events += [loader.stop_event, val_loader.stop_event]

        # mesh + optimizer + state: the data axis can't exceed the batch size
        # (debug runs shrink the batch below the device count)
        import jax as _jax

        n_dev = len(_jax.devices())
        n_data = n_dev
        while batch_size % n_data != 0:
            n_data -= 1
        mesh = mesh_lib.make_mesh(
            n_data=n_data, devices=_jax.devices()[:n_data]
        )
        steps_per_epoch = max(len(loader), 1)
        if max_train_steps is not None:
            # capped epochs (reshuffled subsets): the LR schedule must decay
            # over the steps that will actually run, not the full loader
            steps_per_epoch = min(steps_per_epoch, int(max_train_steps))
        total_steps = steps_per_epoch * num_epochs
        opt_cfg = self.policy.optimizer_cfg
        tx = make_optimizer(
            learning_rate=float(opt_cfg.get("learning_rate", 1e-4)),
            weight_decay=float(opt_cfg.get("weight_decay", 0.02)),
            betas=tuple(opt_cfg.get("betas", (0.9, 0.95))),
            warmup_steps=int(tcfg.get("lr_warmup_steps", 1000)),
            total_steps=total_steps,
            schedule=tcfg.get("lr_scheduler", "cosine"),
            grad_accum=int(tcfg.get("gradient_accumulate_every", 1)),
        )
        params = self.policy.init_params(jax.random.PRNGKey(self.seed))
        shard_opt = bool(tcfg.get("shard_optimizer_state", False))
        state = create_train_state(
            self.policy, params, tx, mesh=mesh, shard_opt_state=shard_opt
        )
        # replicate everything except the (possibly ZeRO-sharded) opt state
        state = state.replace(
            step=mesh_lib.replicate(state.step, mesh),
            mar_params=mesh_lib.replicate(state.mar_params, mesh),
            ema_params=mesh_lib.replicate(state.ema_params, mesh),
            vae_params=mesh_lib.replicate(state.vae_params, mesh),
            opt_state=state.opt_state
            if shard_opt
            else mesh_lib.replicate(state.opt_state, mesh),
        )

        ema_block = cfg.get("ema", {})
        ema_cfg = EmaConfig(
            update_after_step=int(ema_block.get("update_after_step", 0)),
            inv_gamma=float(ema_block.get("inv_gamma", 1.0)),
            power=float(ema_block.get("power", 0.75)),
            min_value=float(ema_block.get("min_value", 0.0)),
            max_value=float(ema_block.get("max_value", 0.9999)),
        )
        train_step = make_train_step(self.policy, tx, ema_cfg, mesh=mesh)

        # resume
        latest_path = os.path.join(self.output_dir, "checkpoints", "latest")
        if tcfg.get("resume", False) and os.path.exists(latest_path):
            state, meta, norm = ckpt_lib.load_checkpoint(latest_path, state)
            self.epoch = meta.get("epoch", 0)
            self.global_step = meta.get("step", 0)
            if norm is not None:
                self.policy.set_normalizer(norm)
            print(f"resumed from {latest_path} @ epoch {self.epoch}")

        logger = ckpt_lib.JsonLogger(os.path.join(self.output_dir, "logs.jsonl"))
        from unified_video_action_tpu.training.trackers import build_tracker

        cfg_dict_for_tracker = (
            cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
        )
        tracker = build_tracker(
            cfg.get("logging"), self.output_dir, config=cfg_dict_for_tracker
        )
        topk_cfg = cfg.get("checkpoint", {}).get("topk", {})
        topk = ckpt_lib.TopKCheckpointManager(
            save_dir=os.path.join(self.output_dir, "checkpoints"),
            monitor_key=topk_cfg.get("monitor_key", "test_mean_score"),
            mode=topk_cfg.get("mode", "max"),
            k=int(topk_cfg.get("k", 1)),
            format_str=topk_cfg.get("format_str", "epoch={epoch:04d}"),
        )

        # env runner (optional) — skipped entirely when rollouts can never
        # fire (rollout_every<=0): building 50+ sim envs costs startup time
        # and host memory that pure-training probes (mar_base_256_viability)
        # should not pay (ADVICE r4). Early stopping needs rollouts anyway.
        env_runner = None
        if (
            rollout_every > 0
            and self.policy.mar_cfg.predict_action
            and "env_runner" in cfg.get("task", {})
        ):
            from unified_video_action_tpu.runners.base import load_env_runner

            run_cfg = cfg
            if debug:
                run_cfg = Cfg.wrap(cfg.to_dict())
                run_cfg["task"]["env_runner"].update(
                    n_train=1, n_test=1, max_steps=20
                )
            env_runner = load_env_runner(run_cfg, output_dir=self.output_dir)

        key = jax.random.PRNGKey(self.seed + 1)
        last_metrics: Dict[str, Any] = {}

        from unified_video_action_tpu.utils import image as image_util

        # device-resident input path: the whole frame store lives in HBM and
        # the host ships only gather indices per step (data/device_dataset.py)
        device_data = None
        if bool(cfg["dataloader"].get("device_resident", False)):
            from unified_video_action_tpu.data.device_dataset import (
                make_device_dataset,
            )

            try:
                device_data = make_device_dataset(dataset)
                print(
                    f"[device_data] {device_data.nbytes/1e9:.2f} GB resident "
                    f"({len(device_data)} samples)"
                )
            except Exception as e:
                print(f"[device_data] falling back to host loader: {e}")

        def _draw_aug(B, H, W):
            m_h, m_w = image_util.aug_margins(H, W)
            return {
                "aug_top": self.np_rng.integers(0, m_h, B).astype(np.int32),
                "aug_left": self.np_rng.integers(0, m_w, B).astype(np.int32),
                "aug_sigma": self.np_rng.uniform(0.1, 2.0, B).astype(
                    np.float32
                ),
            }

        def device_batches():
            """Index-only epoch iterator over the device-resident store;
            mirrors the host DataLoader's shuffle semantics (seeded per
            epoch, drop_last)."""
            order = np.arange(len(device_data))
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
            H, W = device_data.img.shape[1:3]
            for s in range(len(order) // batch_size):
                idxs = order[s * batch_size : (s + 1) * batch_size]
                task_mode = self.policy.choose_task_mode(self.np_rng)
                frame_indices = frame_util.select_frame_indices(
                    device_data.horizon, eval=False,
                    different_history_freq=self.policy.different_history_freq,
                    rng=self.np_rng,
                )
                aug = (
                    _draw_aug(batch_size, H, W)
                    if device_data.data_aug else None
                )
                yield (
                    task_mode, frame_indices, True,
                    device_data.gather(idxs, frame_indices, aug, mesh),
                )

        def prepare(b):
            """Host-side batch prep, run inside the prefetch pipeline BEFORE
            the H2D transfer: choose the task mode + frame indices, then ship
            only the selected image frames (8 of the 16/32-frame horizon) in
            their native uint8 — the dominant saving on the host link (the
            full float32 horizon is ~16x wider). Actions and the other obs
            keys stay full-horizon (compute_loss splits them by their own
            length / frame_indices)."""
            task_mode = self.policy.choose_task_mode(self.np_rng)
            obs = b["obs"]
            ik = image_util.main_image_key(self.policy.task_name, obs)
            T = obs[ik].shape[1]
            # umi stage-2 recipe: a fresh random history-frequency index set
            # per batch (reference utils/data_utils.py:140-158); the indices
            # are a traced train_step input, so this does NOT recompile
            frame_indices = frame_util.select_frame_indices(
                T, eval=False,
                different_history_freq=self.policy.different_history_freq,
                rng=self.np_rng,
            )
            pregathered = False
            if "img_indices" not in obs:  # umi lazy datasets pre-gather
                b, obs = dict(b), dict(obs)
                obs[ik] = np.ascontiguousarray(obs[ik][:, frame_indices])
                b["obs"] = obs
                pregathered = True
            if getattr(dataset, "data_aug", False) and getattr(
                dataset, "device_aug", False
            ):
                # device-side aug: host draws 3 scalars/sample, the TPU does
                # the crop/resize/blur inside the jitted step (the cv2
                # host path saturates a small host at thousands of per-frame
                # calls per batch)
                if not pregathered:
                    b, obs = dict(b), dict(obs)
                    b["obs"] = obs
                H, W = obs[ik].shape[-2:]
                obs.update(_draw_aug(obs[ik].shape[0], H, W))
            return (
                task_mode, frame_indices, pregathered,
                mesh_lib.shard_batch(_to_jax_batch(b), mesh),
            )

        while (
            self.epoch < num_epochs
            and not preempted["flag"]
            and not early["stop"]
        ):
            t0 = time.time()
            epoch_losses = []
            it = (
                device_batches() if device_data is not None
                else _device_prefetch(iter(loader), prepare)
            )
            for i, item in enumerate(it):
                if max_train_steps is not None and i >= max_train_steps:
                    break
                task_mode, frame_indices, pregathered, batch = item
                key, sub = jax.random.split(key)
                state, metrics = train_step(
                    state, batch, sub, task_mode, frame_indices,
                    pregathered=pregathered,
                )
                self.global_step += 1
                epoch_losses.append(metrics)
                if i == 0:
                    print(
                        f"[epoch {self.epoch}] step 0/{steps_per_epoch} "
                        f"dispatched t={time.time() - t0:.0f}s",
                        flush=True,
                    )
                elif (i % 200) == 0 and len(epoch_losses) >= 2:
                    # the PREVIOUS step's metrics are already materialized,
                    # so this fetch doesn't stall the pipeline (at i=0 only
                    # the just-dispatched step exists — skip, a fetch there
                    # would block an epoch-start bubble)
                    prev = jax.device_get(epoch_losses[-2])
                    print(
                        f"[epoch {self.epoch}] step {i}/{steps_per_epoch} "
                        f"loss={float(prev['train_loss']):.4f} "
                        f"t={time.time() - t0:.0f}s",
                        flush=True,
                    )
                if preempted["flag"]:
                    break

            if preempted["flag"]:
                # skip the epoch tail (FVD/val/rollouts/periodic saves):
                # under a preemption grace window only the final checkpoint
                # matters, and the partial epoch must NOT count as done —
                # resume replays it from its start
                break

            m = jax.device_get(epoch_losses[-1]) if epoch_losses else {}
            step_log = {
                "epoch": self.epoch,
                "global_step": self.global_step,
                "epoch_time": time.time() - t0,
                **{k: float(v) for k, v in m.items()},
            }
            # device memory observability (HBM headroom for scale checks);
            # not every backend reports stats — never let this kill training
            try:
                ms = jax.local_devices()[0].memory_stats() or {}
                if "bytes_in_use" in ms:
                    step_log["hbm_bytes_in_use"] = int(ms["bytes_in_use"])
                if "peak_bytes_in_use" in ms:
                    step_log["hbm_peak_bytes"] = int(ms["peak_bytes_in_use"])
            except Exception:
                pass

            # periodic video-generation FVD (reference workspace :350-359)
            sample_every = 1 if debug else int(tcfg.get("sample_every", 5))
            if (
                self.policy.mar_cfg.predict_video
                and sample_every > 0
                and (self.epoch % sample_every) == 0
                and len(val_loader) > 0
            ):
                from unified_video_action_tpu.eval.offline import test_video_fvd

                eval_params = {"mar": state.ema_params, "vae": state.vae_params}
                key, sub = jax.random.split(key)
                try:
                    step_log.update(
                        test_video_fvd(
                            self.policy, eval_params, val_loader, sub,
                            num_batches=1 if debug else 4,
                            output_dir=os.path.join(self.output_dir, "media"),
                        )
                    )
                except Exception as e:  # video eval must never kill training
                    print(f"[fvd] skipped: {e}")

            # validation: action-L2 over val split (reference test_action_l2);
            # in human_pp keypoints.eval mode the first batch also writes a
            # gt-vs-pred overlay video from the SAME prediction
            if val_every > 0 and (self.epoch % val_every) == 0 and len(val_loader) > 0:
                kp_eval = bool(
                    cfg.get("task", {}).get("keypoints", {}).get("eval", False)
                )
                kp_path = os.path.join(
                    self.output_dir, "media", f"keypoints_epoch{self.epoch}.gif"
                )
                val_losses = []
                for j, vb in enumerate(val_loader):
                    if max_val_steps is not None and j >= max_val_steps:
                        break
                    key, sub = jax.random.split(key)
                    try:
                        l2 = self._val_action_l2(
                            state, vb, sub,
                            keypoint_video_path=(
                                kp_path if (kp_eval and j == 0) else None
                            ),
                        )
                    except Exception as e:  # overlay must never kill training
                        print(f"[keypoints] overlay failed: {e}")
                        l2 = self._val_action_l2(state, vb, sub)
                    if l2 is not None:
                        val_losses.append(l2)
                if val_losses:
                    step_log["val_action_l2_distances"] = float(np.mean(val_losses))
                if kp_eval and os.path.exists(kp_path):
                    tracker.log_video(
                        "eval/keypoints", kp_path, step=self.global_step
                    )

            # rollout
            if (
                env_runner is not None
                and rollout_every > 0
                and (self.epoch % rollout_every) == 0
            ):
                from unified_video_action_tpu.runners.base import env_rollout

                eval_params = {
                    "mar": state.ema_params, "vae": state.vae_params
                }
                key, sub = jax.random.split(key)
                runner_log = env_rollout(self.policy, eval_params, env_runner, sub)
                step_log.update(
                    {k: v for k, v in runner_log.items() if "mean_score" in k}
                )
                step_log["test_mean_score"] = runner_log.get("test/mean_score", 0.0)
                # stub-backend rollout scores are a policy-independent seed
                # schedule (envs/stub.py): feeding them to the patience
                # counter would halt a long run after `patience` meaningless
                # rollouts (ADVICE r3) — warn once and skip the update
                if early_stop_patience is not None and "stub" in str(
                    runner_log.get("env_backend", "")
                ):
                    if not early.get("stub_warned"):
                        early["stub_warned"] = True
                        print(
                            "[early-stop] env runner fell back to the stub"
                            " backend; its scores are policy-independent —"
                            " early stopping disabled for this run"
                        )
                elif early_stop_patience is not None:
                    score = step_log["test_mean_score"]
                    if score > early["best"]:
                        early["best"], early["stale"] = score, 0
                    else:
                        early["stale"] += 1
                        if early["stale"] >= early_stop_patience:
                            early["stop"] = True
                            step_log["early_stopped"] = True
                            print(
                                f"[early-stop] no test_mean_score improvement"
                                f" in {early['stale']} rollouts (best"
                                f" {early['best']:.4f}); stopping after epoch"
                                f" {self.epoch}"
                            )

            # metric-based early stop for rollout-free runs: patience on the
            # topk monitor (e.g. stage-1 video_fvd_vae, mode=min) so
            # "convergence" is a plateau, not a guessed epoch count
            if (
                early_stop_patience is not None
                and rollout_every <= 0
                and early_monitor in step_log
            ):
                score = early_sign * float(step_log[early_monitor])
                if score > early["best"]:
                    early["best"], early["stale"] = score, 0
                else:
                    early["stale"] += 1
                    if early["stale"] >= early_stop_patience:
                        early["stop"] = True
                        step_log["early_stopped"] = True
                        print(
                            f"[early-stop] no {early_monitor} improvement in"
                            f" {early['stale']} evals (best"
                            f" {early_sign * early['best']:.4f}); stopping"
                            f" after epoch {self.epoch}"
                        )

            logger.log(step_log, step=self.global_step)
            tracker.log(step_log, step=self.global_step)
            fvd_grid = os.path.join(self.output_dir, "media", "real_vs_pred.gif")
            if any(
                k in step_log
                for k in ("video_fvd", "video_fvd_pixel", "video_fvd_vae")
            ):
                tracker.log_video("eval/video_grid", fvd_grid, step=self.global_step)
            last_metrics = step_log

            # checkpoints
            if checkpoint_every > 0 and (self.epoch % checkpoint_every) == 0:
                cfg_dict = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
                ckpt_lib.save_checkpoint(
                    latest_path, state, cfg=cfg_dict,
                    normalizer=self.policy.normalizer, epoch=self.epoch,
                    blocking=False,  # array write overlaps the next epoch
                )
                monitor = topk.monitor_key
                if monitor in step_log:
                    data = {"epoch": self.epoch, monitor: step_log[monitor],
                            "monitor": step_log[monitor]}
                    p = topk.get_ckpt_path(data)
                    if p is not None:
                        ckpt_lib.save_checkpoint(
                            p, state, cfg=cfg_dict,
                            normalizer=self.policy.normalizer, epoch=self.epoch,
                            blocking=False,
                        )

            self.epoch += 1

        if preempted["flag"]:
            cfg_dict = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
            ckpt_lib.save_checkpoint(
                latest_path, state, cfg=cfg_dict,
                normalizer=self.policy.normalizer, epoch=self.epoch,
            )
            print(f"[preempt] checkpoint saved at epoch {self.epoch}; exiting")
        elif (
            num_epochs > 0
            and checkpoint_every > 0
            and (self.epoch - 1) % checkpoint_every != 0
        ):
            # the run's final epoch (normal or early-stopped) falls between
            # periodic saves — always publish it as `latest` (the periodic
            # cadence is a crash-safety knob, not a statement about which
            # weights matter). checkpoint_every<=0 means "never save" (the
            # pure-training-envelope contract, ADVICE r4): no final save
            # either, so its device_get of the full state never pollutes a
            # measured wall-time budget.
            cfg_dict = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
            ckpt_lib.save_checkpoint(
                latest_path, state, cfg=cfg_dict,
                normalizer=self.policy.normalizer, epoch=self.epoch - 1,
            )
        for sig, h in prev_handlers.items():
            _signal.signal(sig, h)
        ckpt_lib.wait_for_checkpoints()  # commit any in-flight async save
        shutdown_done.set()  # disarm the preemption watchdog: ckpt durable
        logger.close()
        tracker.finish()
        self.state = state
        return last_metrics

    # ------------------------------------------------------------------

    def _val_action_l2(
        self, state, batch, key, keypoint_video_path=None
    ) -> Optional[float]:
        """RMSE between predicted and ground-truth future action chunk over the
        first 9 dims (reference eval/eval.py:282-417)."""
        if not self.policy.mar_cfg.predict_action:
            return None
        obs = batch["obs"]
        from unified_video_action_tpu.utils.image import main_image_key

        img_key = main_image_key(self.policy.task_name, obs)
        T = obs[img_key].shape[1]
        n_obs = T // 2
        obs_dict = {
            k: np.asarray(v[:, :n_obs]) for k, v in obs.items()
        }
        params = {"mar": state.ema_params, "vae": state.vae_params}
        lang = batch.get("language_latents")
        result = self.policy.predict_action(
            params, obs_dict, key,
            language_goal=np.asarray(lang) if lang is not None else None,
        )
        actions = np.asarray(batch["action"])
        _, future = frame_util.split_trajectory(
            actions, T, self.policy.shift_action, self.policy.use_history_action
        )
        pred = result["action_pred"]
        if keypoint_video_path is not None:
            # human_pp keypoints.eval overlay, reusing THIS prediction
            # (reference eval/eval.py keypoint branch) — no extra sampling
            from unified_video_action_tpu.eval.offline import (
                _write_keypoint_overlay,
            )

            _write_keypoint_overlay(
                np.asarray(obs[img_key][0]), future[0], pred[0],
                keypoint_video_path,
            )
        n = min(pred.shape[-1], 9)
        d = pred[..., :n] - future[..., :n]
        return float(np.sqrt((d**2).mean()))


def _to_jax_batch(batch):
    """Numeric leaves -> jnp arrays; host-only string fields (e.g. the UMI
    items' ``dataset_name``) are dropped — they exist for host bookkeeping
    and are not valid device arrays."""
    import numpy as np
    import jax.numpy as jnp

    def keep(x):
        return np.asarray(x).dtype.kind not in ("U", "S", "O")

    if isinstance(batch, dict):
        return {
            k: _to_jax_batch(v) if isinstance(v, dict) else jnp.asarray(v)
            for k, v in batch.items()
            if isinstance(v, dict) or keep(v)
        }
    return jax.tree.map(jnp.asarray, batch)


def _device_prefetch(it, transfer, depth: int = 2):
    """Keep ``depth`` batches in flight on device: jax transfers are async,
    so the NEXT batch's H2D upload overlaps the current train step (the
    device-side analog of the reference's DataLoader prefetch)."""
    import collections

    buf = collections.deque()
    for item in it:
        buf.append(transfer(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


register(
    "unified_video_action_tpu.training.workspace.TrainWorkspace",
    "unified_video_action.workspace.train_unified_video_action_workspace.TrainUnifiedVideoActionWorkspace",
)(TrainWorkspace)
