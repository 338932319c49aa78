"""GT generator tests: the synthetic-warp exactness check
(cartesian_groundtruth_cc_testme,
/root/reference/radial/radial_opticalflow_groundtruth.lua:170-210): build a
known flow, warp an image by it, assert the cross-correlation GT recovers the
flow exactly in the valid interior. Plus box-filter vs brute-force equality
and cache behavior."""

import os

import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.data import groundtruth
from depth_estimation_tpu.geometry import Geometry
from depth_estimation_tpu.training import score
import pytest


def small_geometry():
    return Geometry(
        hImg=32, wImg=40,
        layers=((3, 4, 4, 48),),
        maxh=6, maxw=6, maxhGT=6, maxwGT=6, hKernelGT=4, wKernelGT=4,
    )


def test_patch_ssd_equals_unfolded_match():
    """Box-filter formulation == unfold+match_ssd (the reference's
    construction)."""
    from depth_estimation_tpu.ops import matching

    g = small_geometry()
    rng = np.random.RandomState(0)
    im1 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)
    im2 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)

    got = np.asarray(groundtruth.patch_ssd_costs(
        jnp.asarray(im1), jnp.asarray(im2), 4, 4, 6, 6))

    # brute force: unfold 4x4 patches as features and run match_ssd
    def unfold(im):
        H, W, C = im.shape
        feats = np.zeros((H - 3, W - 3, 4 * 4 * C), np.float32)
        for i in range(4):
            for j in range(4):
                feats[:, :, (i * 4 + j) * C:(i * 4 + j + 1) * C] = \
                    im[i:i + H - 3, j:j + W - 3]
        return feats

    f1 = unfold(im1)
    f2 = unfold(im2)
    h1 = 2  # ceil(6/2)-1
    f1c = f1[h1:f1.shape[0] - 3, h1:f1.shape[1] - 3]
    want = np.asarray(matching.match_ssd(jnp.asarray(f1c), jnp.asarray(f2), 6, 6))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gt_recovers_constant_shift():
    g = small_geometry()
    rng = np.random.RandomState(1)
    im2 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)
    dy, dx = 2, -1
    im1 = np.roll(np.roll(im2, -dy, axis=0), -dx, axis=1)
    fy, fx, conf = groundtruth.exhaustive_flow(g, im1, im2)
    assert fy.shape == (g.hImg, g.wImg)
    hb, wb = score.borders(groundtruth.gt_geometry(g))
    inner_y = fy[hb + 2:-hb - 2, wb + 2:-wb - 2]
    inner_x = fx[hb + 2:-hb - 2, wb + 2:-wb - 2]
    assert (inner_y == dy).all()
    assert (inner_x == dx).all()
    # borders of the full frame are zero-filled
    assert (fy[0] == 0).all() and (fx[:, 0] == 0).all()


def test_gt_cache_roundtrip(tmp_path):
    g = small_geometry()
    rng = np.random.RandomState(2)
    im1 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)
    im2 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)
    fy1, fx1, c1 = groundtruth.cached_exhaustive_flow(
        str(tmp_path), g, 1, "frame0", im1, im2)
    path = groundtruth._cache_path(str(tmp_path), g, 1, "frame0")
    assert os.path.exists(path)
    # second call hits the cache (mutate inputs: result must be unchanged)
    fy2, fx2, c2 = groundtruth.cached_exhaustive_flow(
        str(tmp_path), g, 1, "frame0", im2, im1)
    np.testing.assert_array_equal(fy1, fy2)
    np.testing.assert_array_equal(fx1, fx2)


def test_eval_flow_scores():
    g = small_geometry()
    gt = np.zeros((2, g.hImg, g.wImg), np.float32)
    out = gt.copy()
    s = score.eval_flow(g, out, gt)
    assert s.n_bad == 0 and s.n_near == 0 and s.accuracy == 1.0
    out2 = gt.copy()
    hb, wb = score.borders(g)
    out2[0, hb + 1, wb + 1] = 1.0   # one near pixel
    out2[0, hb + 2, wb + 2] = 5.0   # one bad pixel
    s2 = score.eval_flow(g, out2, gt)
    assert s2.n_near == 1 and s2.n_bad == 1
    assert s2.mean_dst > 0


def test_cc_mean_gt_method(tmp_path):
    """'cc-mean' GT (soft-argmax decode, the mean/ cache split of
    groundtruth_opticalflow.lua:296-304): recovers a constant shift with
    fractional precision, and caches under the mean/ directory."""
    import os
    from depth_estimation_tpu.flow.celiu import gaussian_smooth

    g = Geometry(hImg=48, wImg=64, layers=((3, 5, 5, 8),),
                 maxh=6, maxw=6, maxhGT=6, maxwGT=6,
                 hKernelGT=5, wKernelGT=5)
    rng = np.random.RandomState(5)
    # high contrast keeps softmax(-SSD) peaked, so the expectation decode
    # doesn't shrink toward the window center
    base = np.asarray(gaussian_smooth(
        jnp.asarray(rng.rand(48, 80, 3).astype(np.float32)), 1.0, 3)) * 4.0
    dx = 2
    im1 = base[:, 8:72]
    im2 = base[:, 8 - dx:72 - dx]
    fy_m, fx_m, conf_m = groundtruth.exhaustive_flow(g, im1, im2,
                                                     method="mean")
    fy_x, fx_x, conf_x = groundtruth.exhaustive_flow(g, im1, im2,
                                                     method="max")
    inner = np.s_[12:-12, 12:-12]
    # WTA is integer-valued; the mean head is a continuous expectation
    assert np.allclose(fx_x[inner], np.round(fx_x[inner]))
    assert abs(np.median(fx_m[inner]) - dx) < 0.3
    assert not np.allclose(fx_m[inner], np.round(fx_m[inner]))
    # batched path agrees with the single path for the mean method
    bfy, bfx, bconf = groundtruth.exhaustive_flow_batched(
        g, np.stack([im1]), np.stack([im2]), method="mean")
    np.testing.assert_allclose(bfx[0], fx_m, atol=1e-5)
    # cache split: mean/ and max/ are distinct directories
    groundtruth.cached_exhaustive_flow(str(tmp_path), g, 1, "f0", im1, im2,
                                       "mean")
    groundtruth.cached_exhaustive_flow(str(tmp_path), g, 1, "f0", im1, im2,
                                       "max")
    root = tmp_path / "flow" / "64x48" / "6x5"
    assert (root / "mean" / "1" / "f0.npz").exists()
    assert (root / "max" / "1" / "f0.npz").exists()


@pytest.mark.slow
def test_liu_groundtruth_selected_by_loader(tmp_path):
    """-gt liu must actually route GT through the variational solver
    (previously the loader silently computed cross-correlation GT)."""
    import dataclasses as dc
    from depth_estimation_tpu.data import datasets
    from depth_estimation_tpu.geometry3d import calibration
    from tests.test_datasets import make_sequence, small_cal

    g = Geometry(hImg=64, wImg=80, layers=((3, 5, 5, 8),),
                 maxh=6, maxw=6, maxhGT=6, maxwGT=6,
                 hKernelGT=5, wKernelGT=5)
    cal = small_cal(64, 80)
    root = make_sequence(tmp_path, n=3)
    raw = datasets.load_data_optical_flow(
        g, cal, root, 3, cache_root=str(tmp_path / "c"), groundtruth="liu")
    good = [f for f in raw["flow"] if f is not None]
    assert good, "no good pairs"
    # liu GT is cached as png-equivalent npz under the celiu cache dir
    import os
    found = []
    for dirpath, _, files in os.walk(tmp_path / "c"):
        found.extend(os.path.join(dirpath, f) for f in files)
    assert found, "liu GT cache not written"
    # rotation-compensated pan: x-flow magnitude bounded by the pan size
    assert np.abs(good[0][1]).max() <= 4
