"""MultiCameraVisualizer: grid compositing + headless process integration.

Capability parity target: reference multi_camera_visualizer.py:8-85 (tiling
layout, rgb_to_bgr, fill for empty cells); here the composited grid is also
published to a shared-memory ring so the component runs headless.
"""

import time

import numpy as np
import pytest

from unified_video_action_tpu.real.visualizer import (
    MultiCameraVisualizer,
    tile_grid,
)


def _frame(h, w, val):
    return np.full((h, w, 3), val, np.uint8)


def test_tile_grid_layout_row_major_and_fill():
    frames = [_frame(4, 6, v) for v in (10, 20, 30)]
    grid = tile_grid(frames, row=2, col=2, fill_value=7)
    assert grid.shape == (8, 12, 3)
    assert (grid[:4, :6] == 10).all()
    assert (grid[:4, 6:] == 20).all()
    assert (grid[4:, :6] == 30).all()
    assert (grid[4:, 6:] == 7).all()  # empty cell keeps fill value


def test_tile_grid_rgb_to_bgr_swaps_channels():
    f = np.zeros((2, 2, 3), np.uint8)
    f[..., 0] = 255  # pure red in RGB
    grid = tile_grid([f], row=1, col=1, rgb_to_bgr=True)
    assert (grid[..., 2] == 255).all() and (grid[..., 0] == 0).all()


def test_tile_grid_validates_shapes():
    with pytest.raises(ValueError):
        tile_grid([], 1, 1)
    with pytest.raises(ValueError):
        tile_grid([_frame(4, 4, 1), _frame(4, 8, 2)], 1, 2)
    with pytest.raises(ValueError):
        tile_grid([np.zeros((4, 4, 4), np.uint8)], 1, 1)


@pytest.mark.slow
def test_visualizer_process_composes_camera_rings():
    from unified_video_action_tpu.real import CameraProcess
    from unified_video_action_tpu.real.sim import SimCameraBackend

    cams = [
        CameraProcess(SimCameraBackend((16, 16), seed=s),
                      resolution=(16, 16), fps=30.0)
        for s in (1, 2)
    ]
    for c in cams:
        c.start_wait()
    vis = MultiCameraVisualizer(cams, row=1, col=2, vis_fps=20.0,
                                sink="ring", rgb_to_bgr=False)
    try:
        with vis:
            time.sleep(0.5)
            out = vis.get(2)
            assert out["grid"].shape == (2, 16, 32, 3)
            # both cells carry live (distinct-seed) camera content
            left = out["grid"][-1, :, :16]
            right = out["grid"][-1, :, 16:]
            assert left.std() > 0 and right.std() > 0
            assert not np.array_equal(left, right)
            assert out["timestamp"][-1] > 0
    finally:
        for c in cams:
            c.stop_wait()
