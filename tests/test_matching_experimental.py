"""Contract tests for the experimental matcher formulations
(ops/matching_experimental.py) — measured-slower study kernels that must
still satisfy the production (idx, ey, ex, pmax) decode contract."""

import numpy as np
import jax.numpy as jnp

from depth_estimation_tpu.ops import matching
from depth_estimation_tpu.ops import matching_experimental


def test_throughput_kernel_agrees():
    """Batch-on-lanes kernel decodes identically (interpret mode, small)."""
    maxh = maxw = 4
    rng = np.random.RandomState(9)
    B = 3
    f1 = jnp.asarray(rng.rand(B, 11, 13, 5), np.float32)
    f2 = jnp.asarray(rng.rand(B, 14, 16, 5), np.float32)
    i1, y1, x1, p1 = matching.match_flow_fused(f1, f2, maxh, maxw, 8, True)
    i2, y2, x2, p2 = matching_experimental.match_flow_throughput(
        f1, f2, maxh, maxw, 8, 8, True)
    assert (np.asarray(i1) == np.asarray(i2)).mean() > 0.99
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_mxu_variant_matches_fused_contract():
    """match_flow_mxu (the MXU band-matmul study variant — measured ~7x
    slower than the Pallas kernel at K=10, kept for feature counts near
    128) must produce the same (idx, ey, ex, pmax) contract as the fused
    kernel."""
    rng = np.random.RandomState(9)
    maxh = maxw = 6
    H, W, K = 16, 24, 5
    f1 = jnp.asarray(rng.rand(H, W, K), jnp.float32)
    f2 = jnp.asarray(rng.rand(H + maxh - 1, W + maxw - 1, K), jnp.float32)
    im, ym, xm, pm = matching_experimental.match_flow_mxu(f1, f2, maxh, maxw, 8,
                                             jnp.float32)
    i0, y0, x0, p0 = matching.match_flow_fused(f1, f2, maxh, maxw, 8, True)
    agree = (np.asarray(im) == np.asarray(i0)).mean()
    assert agree > 0.99, agree
    np.testing.assert_allclose(np.asarray(ym), np.asarray(y0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(xm), np.asarray(x0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(p0), atol=1e-3)
