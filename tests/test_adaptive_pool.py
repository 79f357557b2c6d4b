"""ConvFcPool adaptive pooling vs torch AdaptiveAvgPool2d (any grid width —
the 96px single-chip config has a 6x6 token grid, reference
diffusion_action_loss.py:35-61 assumes 16x16)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from unified_video_action_tpu.models.heads import _adaptive_pool_matrix


@pytest.mark.parametrize("W", [4, 6, 7, 16])
def test_matches_torch_adaptive_avg_pool(W):
    x = np.random.default_rng(0).standard_normal((2, 5, W, W)).astype(np.float32)
    want = torch.nn.AdaptiveAvgPool2d((4, 4))(torch.from_numpy(x)).numpy()
    P = _adaptive_pool_matrix(W, 4)
    got = np.einsum("iw,bcwh,jh->bcij", P, x, P)
    np.testing.assert_allclose(got, want, atol=1e-6)
