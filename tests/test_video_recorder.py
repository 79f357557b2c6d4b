"""Camera ring -> VideoRecorderProcess -> playable mp4, fully cross-process."""

import os
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unified_video_action_tpu.real.camera import CameraProcess
from unified_video_action_tpu.real.video_recorder import VideoRecorderProcess

pytestmark = pytest.mark.slow


class SyntheticBackend:
    """Camera backend producing numbered gradient frames."""

    def __init__(self, size=48):
        self.size = size
        self.i = 0

    def connect(self):
        pass

    def grab(self):
        f = np.full((self.size, self.size, 3), (self.i * 7) % 255, np.uint8)
        self.i += 1
        return f, time.time()

    def close(self):
        pass


def test_record_episode_to_mp4(tmp_path):
    cam = CameraProcess(SyntheticBackend(), resolution=(48, 48), fps=60.0)
    cam.start_wait()
    rec = VideoRecorderProcess(cam.ring, fps=30.0)
    rec.start_wait()
    path = str(tmp_path / "ep" / "video.mp4")
    try:
        rec.start_recording(path)
        deadline = time.time() + 20
        while rec.n_written < 10 and time.time() < deadline:
            time.sleep(0.1)
        rec.stop_recording()
        time.sleep(0.5)
        n = rec.n_written
        assert n >= 10, n
    finally:
        rec.stop_wait()
        cam.stop_wait()

    reader = cv2.VideoCapture(path)
    frames = 0
    while True:
        ok, frame = reader.read()
        if not ok:
            break
        assert frame.shape == (48, 48, 3)
        frames += 1
    reader.release()
    assert frames >= 10


def test_stop_without_recording_is_clean(tmp_path):
    cam = CameraProcess(SyntheticBackend(32), resolution=(32, 32), fps=30.0)
    cam.start_wait()
    rec = VideoRecorderProcess(cam.ring)
    rec.start_wait()
    try:
        time.sleep(0.3)
        assert rec.n_written == 0
    finally:
        rec.stop_wait()
        cam.stop_wait()
    assert not rec.is_alive()
