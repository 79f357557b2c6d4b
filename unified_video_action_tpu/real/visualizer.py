"""Multi-camera grid visualizer process.

Equivalent capability to the reference's ``MultiCameraVisualizer``
(umi/real_world/multi_camera_visualizer.py:8-85): a child process pulls the
latest frame from each camera ring at ``vis_fps``, tiles them row-major into
a single grid image, and shows it. Differences by design:

- sources are N ``CameraProcess`` rings (this runtime has no monolithic
  MultiUvcCamera; each camera is its own process), read without blocking
  the writers;
- the sink is pluggable: a cv2 window when a display + cv2 exist, else the
  composited grid is published into its own shared-memory ring so a recorder
  or remote viewer can consume it — making the component fully testable
  headless (the reference hard-requires ``cv2.imshow``).
"""

from __future__ import annotations

import multiprocessing as mp
import time
from typing import Dict, Optional, Sequence

import numpy as np

from unified_video_action_tpu.ipc.shm import SharedMemoryRingBuffer
from unified_video_action_tpu.real.controller import _unique_name

__all__ = ["MultiCameraVisualizer", "tile_grid"]


def tile_grid(frames: Sequence[np.ndarray], row: int, col: int,
              fill_value: int = 0, rgb_to_bgr: bool = False) -> np.ndarray:
    """Tile N HxWx3 frames row-major into a (row*H, col*W, 3) uint8 grid.

    Missing cells (idx >= N) stay at ``fill_value``; mirrors the reference's
    layout loop (multi_camera_visualizer.py:66-81).
    """
    if not frames:
        raise ValueError("no frames to tile")
    H, W, C = frames[0].shape
    if C != 3:
        raise ValueError(f"expected 3-channel frames, got {C}")
    grid = np.full((H * row, W * col, 3), fill_value, dtype=np.uint8)
    sl = slice(None, None, -1) if rgb_to_bgr else slice(None)
    for idx, f in enumerate(frames[: row * col]):
        if f.shape != (H, W, C):
            raise ValueError(
                f"frame {idx} shape {f.shape} != first frame {(H, W, C)}"
            )
        r, c = divmod(idx, col)
        grid[H * r:H * (r + 1), W * c:W * (c + 1)] = f[:, :, sl]
    return grid


class MultiCameraVisualizer(mp.Process):
    """Compose N camera rings into one live grid view.

    Parameters
    ----------
    cameras:
        ``CameraProcess`` instances (started by the caller); only their rings
        are touched here.
    row, col:
        grid layout; ``row*col`` may exceed ``len(cameras)`` (blank cells).
    sink:
        "window" tries a cv2 window (falls back to ring-only when cv2 or a
        display is absent); "file" additionally publishes the grid
        atomically to ``out_path`` as .npy (remote/headless monitoring);
        "ring" publishes to the shared-memory ring only. The ring is always
        written regardless of sink.
    """

    def __init__(self, cameras: Sequence, row: int, col: int,
                 window_name: str = "Multi Cam Vis", vis_fps: float = 30.0,
                 fill_value: int = 0, rgb_to_bgr: bool = True,
                 sink: str = "window", out_path: Optional[str] = None,
                 get_max_k: int = 8):
        super().__init__(daemon=True)
        if not cameras:
            raise ValueError("need at least one camera")
        self.cameras = list(cameras)
        self.row = int(row)
        self.col = int(col)
        if self.row * self.col < 1:
            raise ValueError("grid must have at least one cell")
        self.window_name = window_name
        self.vis_fps = float(vis_fps)
        self.fill_value = fill_value
        self.rgb_to_bgr = rgb_to_bgr
        if sink not in ("window", "file", "ring"):
            raise ValueError(f"unknown sink {sink!r}")
        if sink == "file" and not out_path:
            raise ValueError("file sink needs out_path")
        self.sink = sink
        self.out_path = out_path
        h, w, _ = self.cameras[0].ring.dtype["color"].shape
        self._cell_hw = (h, w)
        self.ring = SharedMemoryRingBuffer(
            _unique_name("vis"),
            {
                "grid": np.zeros((h * self.row, w * self.col, 3), np.uint8),
                "timestamp": np.zeros((), np.float64),
            },
            get_max_k=get_max_k,
        )
        self.ready_event = mp.Event()
        self._stop_event = mp.Event()

    # -- parent-side API -----------------------------------------------------
    def start_wait(self, timeout: float = 10.0) -> None:
        self.start()
        if not self.ready_event.wait(timeout):
            raise RuntimeError("visualizer failed to become ready")

    def stop_wait(self, timeout: float = 5.0) -> None:
        self._stop_event.set()
        self.join(timeout)
        if self.is_alive():
            self.terminate()

    def get(self, k: int = 1) -> Dict[str, np.ndarray]:
        return self.ring.get_last_k(k)

    def __enter__(self):
        self.start_wait()
        return self

    def __exit__(self, *exc):
        self.stop_wait()

    # -- child-side loop -----------------------------------------------------
    def run(self):  # pragma: no cover - exercised via integration test
        imshow = None
        if self.sink == "window":
            try:
                import cv2

                cv2.setNumThreads(1)
                cv2.namedWindow(self.window_name, cv2.WINDOW_AUTOSIZE)
                imshow = cv2
            except Exception:
                imshow = None  # headless host: ring-only

        dt = 1.0 / self.vis_fps
        t0 = time.monotonic()
        i = 0
        while not self._stop_event.is_set():
            frames = []
            newest = 0.0
            for cam in self.cameras:
                try:
                    s = cam.ring.get_last_k(1)
                    frames.append(s["color"][-1])
                    newest = max(newest, float(s["timestamp"][-1]))
                except Exception:
                    # a camera that has not produced yet renders blank
                    h, w = self._cell_hw
                    frames.append(
                        np.full((h, w, 3), self.fill_value, np.uint8)
                    )
            grid = tile_grid(frames, self.row, self.col,
                             fill_value=self.fill_value,
                             rgb_to_bgr=self.rgb_to_bgr)
            self.ring.put({
                "grid": grid,
                "timestamp": np.float64(newest or time.time()),
            })
            if self.sink == "file":
                import os

                tmp = self.out_path + ".tmp.npy"
                np.save(tmp, grid)
                os.replace(tmp, self.out_path)
            if imshow is not None:
                try:
                    imshow.imshow(self.window_name, grid)
                    imshow.pollKey()
                except Exception:
                    imshow = None
            if i == 0:
                self.ready_event.set()
            i += 1
            sleep = (t0 + i * dt) - time.monotonic()
            if sleep > 0:
                time.sleep(sleep)
