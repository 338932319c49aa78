"""Pallas banded bilinear warp: parity with the XLA shift-sum form and
with the 4-tap gather inside the band (ops/warp.py vs
geometry3d/undistort.py)."""

import numpy as np
import jax.numpy as jnp

from depth_estimation_tpu.geometry3d import undistort as undist
from depth_estimation_tpu.geometry3d.calibration import ARDRONE
from depth_estimation_tpu.ops.warp import banded_bilinear_warp


def _setup(B=2, H=48, W=64, C=3, seed=0):
    rng = np.random.RandomState(seed)
    imgs = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    Ks = ARDRONE.K.copy()
    Ks[0] *= W / ARDRONE.wImg
    Ks[1] *= H / ARDRONE.hImg
    angles = (0.013, -0.021)[:B]
    R = jnp.asarray(np.stack([
        np.array([[np.cos(a), -np.sin(a), 0.01 * a],
                  [np.sin(a), np.cos(a), 0.0],
                  [0.0, 0.0, 1.0]], np.float32) for a in angles]))
    return imgs, Ks, R, H, W


def test_pallas_banded_warp_matches_xla_form():
    """Bit-level (f32 accumulation-order) agreement with the XLA
    shift-sum lowering, masked pixels included."""
    imgs, Ks, R, H, W = _setup()
    band = 6
    ref = undist._remove_ego_motion_banded_xla(imgs, Ks, R, band)
    xs, ys = undist.homography_grid(Ks, R, H, W)
    got = banded_bilinear_warp(imgs, xs, ys, band, interpret=True)
    ok = undist.ego_motion_valid_mask(Ks, R, H, W, band=band)
    np.testing.assert_allclose(np.asarray(got * ok[..., None]),
                               np.asarray(ref), atol=1e-5)


def test_pallas_banded_warp_matches_gather_in_band():
    """Inside the band the banded sum IS the 4-tap bilinear gather."""
    imgs, Ks, R, H, W = _setup(seed=3)
    band = 8
    gathered = undist.remove_ego_motion_batched(imgs, Ks, R)
    xs, ys = undist.homography_grid(Ks, R, H, W)
    got = banded_bilinear_warp(imgs, xs, ys, band, interpret=True)
    ok = np.asarray(undist.ego_motion_valid_mask(Ks, R, H, W, band=band))
    m = ok[..., None] > 0.5
    d = np.abs(np.asarray(got) * ok[..., None] - np.asarray(gathered))
    assert d[np.broadcast_to(m, d.shape)].max() < 1e-4


def test_pallas_banded_warp_block_rows_pure_blocking():
    """block_rows is a pure blocking factor — outputs identical."""
    imgs, Ks, R, H, W = _setup(B=1, H=40, W=128, seed=5)
    xs, ys = undist.homography_grid(Ks, R, H, W)
    a = banded_bilinear_warp(imgs, xs, ys, 6, 8, interpret=True)
    b = banded_bilinear_warp(imgs, xs, ys, 6, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remove_ego_motion_banded_dispatch_unchanged_off_tpu():
    """On non-TPU backends remove_ego_motion_banded keeps the XLA form
    (the Pallas path is TPU-only); contract outputs agree regardless."""
    imgs, Ks, R, H, W = _setup(seed=7)
    out = undist.remove_ego_motion_banded(imgs, Ks, R, 6)
    ref = undist._remove_ego_motion_banded_xla(imgs, Ks, R, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
