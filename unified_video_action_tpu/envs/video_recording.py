"""Per-step video recording wrapper.

Equivalent of the reference's ``VideoRecordingWrapper`` + ``VideoRecorder``
(gym_util/video_recording_wrapper.py:6-66, video_recorder.py:52-163): record
``render()`` frames every ``steps_per_render`` env steps into an mp4 (cv2
writer instead of PyAV, which is not in this dependency set)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class VideoRecorder:
    """Writes mp4 via cv2 when available; degrades to an animated gif via
    imageio otherwise (the ``.mp4`` suffix is swapped for ``.gif``) instead of
    refusing to record."""

    def __init__(self, fps: int = 10, codec: str = "mp4v"):
        self.fps = fps
        self.codec = codec
        self.writer = None
        self.path: Optional[str] = None
        self._gif_frames: Optional[list] = None

    def start(self, path: str) -> None:
        if cv2 is None and path.endswith(".mp4"):
            path = path[: -len(".mp4")] + ".gif"
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.stop()
        self.path = path
        self.writer = None  # lazy-open on first frame (need frame size)
        self._gif_frames = [] if (cv2 is None or path.endswith(".gif")) else None

    def write_frame(self, frame: np.ndarray) -> None:
        if self.path is None:
            return
        if self._gif_frames is not None:
            self._gif_frames.append(np.asarray(frame))
            return
        if self.writer is None:
            h, w = frame.shape[:2]
            self.writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*self.codec), self.fps, (w, h)
            )
        self.writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    def stop(self) -> Optional[str]:
        if self._gif_frames is not None:
            frames, self._gif_frames = self._gif_frames, None
            path, self.path = self.path, None
            if not frames:
                return None
            import imageio.v2 as imageio

            imageio.mimwrite(path, frames, duration=1000.0 / self.fps)
            return path
        if self.writer is not None:
            self.writer.release()
            self.writer = None
            path, self.path = self.path, None
            return path
        self.path = None
        return None

    @property
    def is_ready(self) -> bool:
        return self.path is not None


class VideoRecordingWrapper:
    def __init__(
        self,
        env,
        video_recorder: Optional[VideoRecorder] = None,
        file_path: Optional[str] = None,
        steps_per_render: int = 1,
    ):
        self.env = env
        self.video_recorder = video_recorder or VideoRecorder()
        self.file_path = file_path
        self.steps_per_render = steps_per_render
        self._step_count = 0

    def reset(self, *args, **kwargs):
        out = self.env.reset(*args, **kwargs)
        self._step_count = 1
        self.video_recorder.stop()
        if self.file_path is not None:
            self.video_recorder.start(self.file_path)
            frame = self.env.render()
            if frame is not None:
                self.video_recorder.write_frame(np.asarray(frame))
        return out

    def step(self, action):
        result = self.env.step(action)
        self._step_count += 1
        if (
            self.file_path is not None
            and self._step_count % self.steps_per_render == 0
        ):
            frame = self.env.render()
            if frame is not None:
                self.video_recorder.write_frame(np.asarray(frame))
        return result

    def render(self, *args, **kwargs):
        return self.env.render(*args, **kwargs)

    def stop_recording(self) -> Optional[str]:
        return self.video_recorder.stop()

    def __getattr__(self, name):
        return getattr(self.env, name)
