"""Camera-stream video recorder process.

Capability parity with the reference's ``umi/real_world/video_recorder.py``
(mp.Process draining camera frames into an h264 file, start/stop per
episode): a child process follows a camera's shared-memory ring (fork-
inherited from real/camera.CameraProcess) and appends every new frame to the
active video file via cv2.VideoWriter. Episode lifecycle maps to
start_recording(path) / stop_recording(), matching UmiRealEnv's
start_episode/end_episode timing.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time
from typing import Optional


class VideoRecorderProcess(mp.Process):
    def __init__(self, ring, fps: float = 30.0, poll_hz: float = 120.0):
        super().__init__(daemon=True)
        self.ring = ring
        self.fps = float(fps)
        self.poll_dt = 1.0 / float(poll_hz)
        self._cmd: mp.Queue = mp.Queue()
        self.ready_event = mp.Event()
        self._stop_event = mp.Event()
        self._n_written = mp.Value("l", 0)

    # -- parent-side API ----------------------------------------------------

    def start_wait(self, timeout: float = 10.0) -> None:
        self.start()
        if not self.ready_event.wait(timeout):
            raise RuntimeError("video recorder failed to become ready")

    def start_recording(self, path: str) -> None:
        self._cmd.put(("start", path))

    def stop_recording(self) -> None:
        self._cmd.put(("stop", None))

    def stop_wait(self, timeout: float = 5.0) -> None:
        self._cmd.put(("stop", None))
        self._stop_event.set()
        self.join(timeout)
        if self.is_alive():
            self.terminate()

    @property
    def n_written(self) -> int:
        return int(self._n_written.value)

    # -- child-side loop ----------------------------------------------------

    def run(self):  # pragma: no cover - exercised via integration test
        import queue as _queue

        import cv2

        writer: Optional[cv2.VideoWriter] = None
        last_ts = float("-inf")
        self.ready_event.set()
        while not self._stop_event.is_set():
            try:
                cmd, arg = self._cmd.get_nowait()
                if cmd == "start":
                    if writer is not None:
                        writer.release()
                    os.makedirs(os.path.dirname(arg) or ".", exist_ok=True)
                    writer = None
                    self._path = arg
                    last_ts = float("-inf")
                elif cmd == "stop":
                    if writer is not None:
                        writer.release()
                        writer = None
                    self._path = None
            except _queue.Empty:
                pass

            if getattr(self, "_path", None) is not None and self.ring.count > 0:
                data = self.ring.get_last_k(1)
                ts = float(data["timestamp"][0])
                # decimate to the container rate: write a frame only when a
                # full 1/fps period has elapsed in SOURCE timestamps, so the
                # mp4 plays back in real time regardless of the camera's own
                # rate (reference steps_per_render semantics)
                if ts - last_ts >= 1.0 / self.fps - 1e-6:
                    frame = data["color"][0]
                    if writer is None:
                        h, w = frame.shape[:2]
                        writer = cv2.VideoWriter(
                            self._path,
                            cv2.VideoWriter_fourcc(*"mp4v"),
                            self.fps,
                            (w, h),
                        )
                    writer.write(frame[..., ::-1])  # rgb -> bgr
                    with self._n_written.get_lock():
                        self._n_written.value += 1
                    last_ts = ts
            time.sleep(self.poll_dt)
        if writer is not None:
            writer.release()
