"""Width-folded conv: value + gradient equivalence with the direct
VALID conv across kernel sizes, fold factors, and non-divisible shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.ops.s2d_conv import (
    fold_kernel, pick_s2d_factor, s2d_conv)


def _direct(x, w):
    xb = x[None] if x.ndim == 3 else x
    y = jax.lax.conv_general_dilated(
        xb, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[0] if x.ndim == 3 else y


@pytest.mark.parametrize("kh,kw,s", [
    (16, 16, 4), (16, 16, 8), (16, 16, 16), (16, 16, 2),
    (5, 5, 2), (5, 5, 4), (5, 5, 8),      # s > kw works too
    (17, 17, 4), (3, 7, 2), (1, 1, 2),
])
def test_s2d_conv_matches_direct(kh, kw, s):
    rng = np.random.RandomState(kh * 100 + kw * 10 + s)
    # sizes chosen so n_w is NOT divisible by s (the padded tail path)
    x = jnp.asarray(rng.randn(2, kh + 22, kw + 29, 3), jnp.float32)
    w = jnp.asarray(rng.randn(kh, kw, 3, 10), jnp.float32)
    y0 = _direct(x, w)
    y1 = s2d_conv(x, w, s)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=0, atol=2e-4)


def test_s2d_conv_unbatched_and_s1():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(20, 24, 3), jnp.float32)
    w = jnp.asarray(rng.randn(5, 5, 3, 4), jnp.float32)
    np.testing.assert_allclose(np.asarray(s2d_conv(x, w, 2)),
                               np.asarray(_direct(x, w)), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2d_conv(x, w, 1)),
                               np.asarray(_direct(x, w)), atol=0)


def test_fold_kernel_gradients_flow_to_direct_kernel():
    """The kernel map is one static matmul: training through the folded
    form must produce the same kernel gradients as the direct conv."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 21, 23, 3), jnp.float32)
    w = jnp.asarray(rng.randn(5, 5, 3, 6), jnp.float32)
    t = jnp.asarray(rng.randn(1, 17, 19, 6), jnp.float32)

    def loss_direct(w):
        return jnp.sum((_direct(x, w) - t) ** 2)

    def loss_s2d(w):
        return jnp.sum((s2d_conv(x, w, 4) - t) ** 2)

    g0 = jax.grad(loss_direct)(w)
    g1 = jax.grad(loss_s2d)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=0, atol=5e-3)


def test_fold_kernel_shape_and_mass():
    """Folded kernel holds each original tap exactly s times (one per
    output phase q), zeros elsewhere."""
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(16, 16, 3, 10), jnp.float32)
    s = 8
    w2 = fold_kernel(w, s)
    kw2 = (16 + s - 2) // s + 1
    assert w2.shape == (16, kw2, s * 3, s * 10)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(w2))),
                               s * float(jnp.sum(jnp.abs(w))),
                               rtol=1e-5)   # f32 accumulation order


def test_pick_s2d_factor_policy(monkeypatch):
    assert pick_s2d_factor(16, 16, 3, 10) == 8       # 80 lanes >= 64
    assert pick_s2d_factor(5, 5, 3, 10) == 1         # small K: direct wins
    assert pick_s2d_factor(5, 5, 10, 10) == 1        # K=250 < 256
    assert pick_s2d_factor(17, 17, 3, 10) == 8       # v2-scale kernel
    assert pick_s2d_factor(5, 5, 10, 128) == 1       # already efficient
    monkeypatch.setenv("DE_TPU_S2D", "off")
    assert pick_s2d_factor(16, 16, 3, 10) == 1
    monkeypatch.setenv("DE_TPU_S2D", "16")
    assert pick_s2d_factor(16, 16, 3, 10) == 16
