"""Batched full-pipeline correctness: the B-pairs-per-dispatch program
(api.make_batched_pipeline) and its batched building blocks must agree with
the per-frame path (DepthEstimator._step) they amortize.

Program structures differ between the two paths (batched vs per-frame
f32 accumulation orders), so agreement is physical (recovered motion,
flow, masks), not bitwise."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu import api
from depth_estimation_tpu.geometry import Geometry
from depth_estimation_tpu.geometry3d import calibration as calmod
from depth_estimation_tpu.geometry3d import egomotion as ego
from depth_estimation_tpu.models.flow import FlowModel
from depth_estimation_tpu.ops import extract


def _texture(rng, h, w):
    """Smooth random texture with enough corners for Shi-Tomasi."""
    base = rng.rand(h // 4, w // 4, 3).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (h, w, 3), "bilinear")
    return np.asarray(img)


def test_good_features_batched_matches_single():
    rng = np.random.RandomState(0)
    imgs = np.stack([_texture(rng, 48, 64) for _ in range(3)])
    pb, vb = ego.good_features_to_track_batched(jnp.asarray(imgs), 32, 0.01)
    for i in range(3):
        ps, vs = ego.good_features_to_track(jnp.asarray(imgs[i]), 32, 0.01)
        # same corners selected (ordering may swap among near-equal scores:
        # compare as sets of valid points)
        got = {tuple(p) for p, v in zip(np.asarray(pb[i]), np.asarray(vb[i])) if v}
        want = {tuple(p) for p, v in zip(np.asarray(ps), np.asarray(vs)) if v}
        inter = len(got & want)
        assert inter >= 0.9 * max(len(want), 1), (i, inter, len(want))


def test_enlarge_mask_batched_matches_single():
    rng = np.random.RandomState(1)
    m = rng.rand(4, 20, 26) > 0.3
    out_b = np.asarray(extract.enlarge_mask_batched(jnp.asarray(m), 5, 3))
    for i in range(4):
        out_s = np.asarray(extract.enlarge_mask(jnp.asarray(m[i]), 5, 3))
        np.testing.assert_array_equal(out_b[i], out_s)


@pytest.mark.slow
def test_ego_motion_batched_recovers_rotation():
    """Each batch item is a pair related by a known small rotation; the
    batched estimator must recover each R (same physics as the per-pair
    path, tests/test_egomotion.py)."""
    from depth_estimation_tpu.geometry3d import undistort as undist
    rng = np.random.RandomState(2)
    h, w = 96, 128
    K = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]],
                 np.float32)
    angles = [0.01, -0.015, 0.02]
    im1s, im2s = [], []
    for a in angles:
        img = _texture(rng, h, w)
        c, s = np.cos(a), np.sin(a)
        # rotate about the y axis (pan): warp with the infinite homography
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        im2 = np.asarray(undist.remove_ego_motion(
            jnp.asarray(img), K, jnp.asarray(R.T)))
        im1s.append(img)
        im2s.append(im2)
    em = ego.get_ego_motion_batched(jnp.asarray(np.stack(im1s)),
                                    jnp.asarray(np.stack(im2s)), K,
                                    max_points=200, quality=0.001)
    R = np.asarray(em.R)
    for i, a in enumerate(angles):
        got = np.arcsin(np.clip(R[i][0, 2], -1, 1))
        assert abs(got - a) < 5e-3, (i, got, a)


@pytest.mark.slow
def test_batched_pipeline_agrees_with_step():
    """The batched program's flow/mask agree with DepthEstimator's per-frame
    path on translation pairs (identical physics; keys differ)."""
    rng = np.random.RandomState(3)
    h, w = 64, 80
    cal = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="t", wImg=w, hImg=h,
        fx=80.0, fy=80.0, cx=w / 2, cy=h / 2,
        sfm=dataclasses.replace(calmod.RECTIFIED_GOPRO_SMALL.sfm,
                                max_points=128))
    g = Geometry(hImg=h, wImg=w, layers=((3, 5, 5, 8),), maxh=6, maxw=6)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(0))

    B = 2
    f1s, f2s = [], []
    for b in range(B):
        img = _texture(rng, h, w)
        dx = 1 + b
        img2 = np.roll(img, -dx, axis=1)
        f1s.append(img)
        f2s.append(img2)
    frames1 = jnp.asarray(np.stack(f1s))
    frames2 = jnp.asarray(np.stack(f2s))

    pipe = api.make_batched_pipeline(g, cal)
    xflow, mask, depth, good = pipe(params, frames1, frames2)
    xflow, mask, good = (np.asarray(a) for a in (xflow, mask, good))

    est = api.DepthEstimator(g, params, cal)
    for b in range(B):
        est.reset(np.asarray(f1s[b]))
        _, xf_s, mask_s = est.next_frame_depth(np.asarray(f2s[b]))
        sel = (mask[b] > 0) & (mask_s > 0)
        assert sel.mean() > 0.2, sel.mean()
        # same flow wherever both paths kept the pixel — robust comparison:
        # f32 accumulation orders differ between the batched and
        # single-frame programs, so R differs by a hair and a few border
        # pixels move
        diff = np.abs(xflow[b][sel] - xf_s[sel])
        assert np.median(diff) < 0.1, np.median(diff)
        assert np.percentile(diff, 95) < 0.5, np.percentile(diff, 95)
        # both mask pipelines keep mostly the same pixels
        agree = ((mask[b] > 0) == (mask_s > 0)).mean()
        assert agree > 0.9, agree
    # depth rule sanity: finite depths only where flow is significant
    d = np.asarray(depth)
    assert np.isfinite(d[np.abs(xflow) >= 0.1]).all()


@pytest.mark.slow
def test_throughput_knobs_agree_with_parity_path():
    """warp_dtype=bf16 + ego_downsample=2 must reproduce the default
    batched path's flow/mask up to small precision noise (these are the
    bench's --fast knobs; their deltas must stay in the inference-noise
    regime)."""
    rng = np.random.RandomState(4)
    h, w = 96, 128
    cal = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="t2", wImg=w, hImg=h,
        fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
        sfm=dataclasses.replace(calmod.RECTIFIED_GOPRO_SMALL.sfm,
                                max_points=128))
    g = Geometry(hImg=h, wImg=w, layers=((3, 5, 5, 8),), maxh=6, maxw=6)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(1))

    B = 2
    f1s, f2s = [], []
    for b in range(B):
        img = _texture(rng, h, w)
        img2 = np.roll(img, -(1 + b), axis=1)
        f1s.append(img)
        f2s.append(img2)
    frames1 = jnp.asarray(np.stack(f1s))
    frames2 = jnp.asarray(np.stack(f2s))

    import jax.numpy as jnp2
    ref = api.BatchedDepthEstimator(g, params, cal)
    ref.reset(frames1)
    xf0, m0, _, good0 = (np.asarray(a) for a in ref.next_frames(frames2))

    fast = api.BatchedDepthEstimator(g, params, cal,
                                     warp_dtype=jnp2.bfloat16,
                                     compensation="decode", lk_iters=5,
                                     ransac_samples=48,
                                     state_dtype=jnp2.bfloat16,
                                     ego_downsample=2)
    fast.reset(frames1)
    xf1, m1, _, good1 = (np.asarray(a) for a in fast.next_frames(frames2))

    np.testing.assert_array_equal(good0, good1)
    sel = (m0 > 0) & (m1 > 0)
    assert sel.mean() > 0.2
    diff = np.abs(xf0[sel] - xf1[sel])
    # decode-side compensation indexes the field at p instead of h^-1(p):
    # with |delta| ~ 1-2 px here that attribution shift moves field
    # samples by the same amount, so agreement is sub-quarter-pixel in the
    # median, not exact (plus a different R from the downsampled ego path)
    assert np.median(diff) < 0.25, np.median(diff)
    # the tail tracks |delta|: this synthetic pair carries ~2 px of
    # rotation-compensated shift, so a few percent of pixels move ~1 px
    assert np.percentile(diff, 95) < 1.5, np.percentile(diff, 95)
    assert diff.mean() < 0.5, diff.mean()


def test_warp_banded_agrees_with_warp():
    """compensation='warp_banded' runs the reference's warp-then-match
    order through the gather-free banded warp: on in-band rotations the
    warped features are EXACT, so flow/mask/good must match the strict
    warp path (identical R estimate — same ego stage — and identical
    matcher inputs up to f32 accumulation order)."""
    rng = np.random.RandomState(9)
    h, w = 96, 128
    cal = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="t3", wImg=w, hImg=h,
        fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
        sfm=dataclasses.replace(calmod.RECTIFIED_GOPRO_SMALL.sfm,
                                max_points=128))
    g = Geometry(hImg=h, wImg=w, layers=((3, 5, 5, 8),), maxh=6, maxw=6)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(1))

    B = 2
    f1s, f2s = [], []
    for b in range(B):
        img = _texture(rng, h, w)
        f1s.append(img)
        f2s.append(np.roll(img, -(1 + b), axis=1))
    frames1 = jnp.asarray(np.stack(f1s))
    frames2 = jnp.asarray(np.stack(f2s))

    ref = api.BatchedDepthEstimator(g, params, cal)
    ref.reset(frames1)
    xf0, m0, _, good0 = (np.asarray(a) for a in ref.next_frames(frames2))

    banded = api.BatchedDepthEstimator(g, params, cal,
                                       compensation="warp_banded")
    banded.reset(frames1)
    xf1, m1, _, good1 = (np.asarray(a) for a in banded.next_frames(frames2))

    np.testing.assert_array_equal(good0, good1)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(xf1, xf0, atol=1e-3)


def test_batched_stream_multi_step():
    """BatchedDepthEstimator over a 4-frame stream: device state chains
    (each step matches against the PREVIOUS frame's features), so a
    constant-velocity sequence yields the per-step shift at every step."""
    rng = np.random.RandomState(5)
    h, w = 64, 80
    cal = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="t3", wImg=w, hImg=h,
        fx=80.0, fy=80.0, cx=w / 2, cy=h / 2,
        sfm=dataclasses.replace(calmod.RECTIFIED_GOPRO_SMALL.sfm,
                                max_points=128))
    g = Geometry(hImg=h, wImg=w, layers=((3, 5, 5, 8),), maxh=6, maxw=6)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(2))

    base = _texture(rng, h, w + 12)
    frames = [base[:, k * 2:k * 2 + w] for k in range(4)]  # dx=2 per step
    B = 2
    est = api.BatchedDepthEstimator(g, params, cal)
    est.reset(jnp.asarray(np.stack([frames[0]] * B)))
    for k in range(1, 4):
        xf, m, _, good = est.next_frames(
            jnp.asarray(np.stack([frames[k]] * B)))
        xf, m = np.asarray(xf), np.asarray(m)
        sel = m > 0
        assert sel.mean() > 0.2, (k, sel.mean())
        # a uniform 2 px shift is exactly what ego-motion reads as camera
        # pan, so the ROTATION-COMPENSATED flow is near zero at EVERY step
        # — which is itself the state-chaining evidence: had the state not
        # advanced, step k would see a 2k px shift, of which up to the
        # window range would leak into the flow as a large bias
        med = np.median(xf[0][sel[0]])
        assert abs(med) < 0.75, (k, med)


def test_make_batched_pipeline_knob_passthrough():
    """make_batched_pipeline(**knobs) must reach the estimator: the
    warp_banded pairs pipeline agrees with the default (in-band rotations
    -> exact warp values), and an unknown knob raises."""
    rng = np.random.RandomState(21)
    h, w = 64, 80
    cal = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="t4", wImg=w, hImg=h,
        fx=80.0, fy=80.0, cx=w / 2, cy=h / 2,
        sfm=dataclasses.replace(calmod.RECTIFIED_GOPRO_SMALL.sfm,
                                max_points=96))
    g = Geometry(hImg=h, wImg=w, layers=((3, 5, 5, 8),), maxh=6, maxw=6)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(2))
    img = _texture(rng, h, w)
    frames1 = jnp.asarray(img[None])
    frames2 = jnp.asarray(np.roll(img, -2, axis=1)[None])

    ref = api.make_batched_pipeline(g, cal)
    banded = api.make_batched_pipeline(g, cal, compensation="warp_banded")
    xf0, m0, _, g0 = (np.asarray(a) for a in ref(params, frames1, frames2))
    xf1, m1, _, g1 = (np.asarray(a) for a in banded(params, frames1,
                                                    frames2))
    np.testing.assert_array_equal(g0, g1)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(xf1, xf0, atol=1e-3)

    import pytest as _pytest
    with _pytest.raises(TypeError):
        api.make_batched_pipeline(g, cal, not_a_knob=1)


def test_ego_motion_grid_selector_recovers_rotation():
    """The sort-free 'grid' corner selector feeds the same LK+RANSAC stack:
    it must recover the same physical rotation as the 'topk' parity rule
    (different corners, same camera motion)."""
    from depth_estimation_tpu.geometry3d import undistort as undist
    rng = np.random.RandomState(5)
    h, w = 96, 128
    K = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]],
                 np.float32)
    angles = [0.012, -0.018]
    im1s, im2s = [], []
    for a in angles:
        img = _texture(rng, h, w)
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        im2 = np.asarray(undist.remove_ego_motion(
            jnp.asarray(img), K, jnp.asarray(R.T)))
        im1s.append(img)
        im2s.append(im2)
    i1 = jnp.asarray(np.stack(im1s))
    i2 = jnp.asarray(np.stack(im2s))
    em_g = ego.get_ego_motion_batched(i1, i2, K, max_points=200,
                                      quality=0.001, selector="grid")
    em_t = ego.get_ego_motion_batched(i1, i2, K, max_points=200,
                                      quality=0.001, selector="topk")
    for i, a in enumerate(angles):
        got = np.arcsin(np.clip(np.asarray(em_g.R)[i][0, 2], -1, 1))
        ref = np.arcsin(np.clip(np.asarray(em_t.R)[i][0, 2], -1, 1))
        assert abs(got - a) < 5e-3, (i, got, a)
        assert abs(got - ref) < 5e-3, (i, got, ref)
        assert int(em_g.n_found[i]) > 50


def test_lk_search_24_agrees_with_32():
    """lk_search=24 (margin 8 >= win/2 — classic pyramid LK's own capture
    range) must recover the same rotations as the conservative 32 window:
    the smaller cached window only removes representable residual motion
    classic LK could not track anyway (api_batched lk_search knob)."""
    from depth_estimation_tpu.geometry3d import undistort as undist
    rng = np.random.RandomState(5)
    h, w = 96, 128
    K = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]],
                 np.float32)
    angles = [0.01, -0.02, 0.03]
    im1s, im2s = [], []
    for a in angles:
        img = _texture(rng, h, w)
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        im2 = np.asarray(undist.remove_ego_motion(
            jnp.asarray(img), K, jnp.asarray(R.T)))
        im1s.append(img)
        im2s.append(im2)
    a1 = jnp.asarray(np.stack(im1s))
    a2 = jnp.asarray(np.stack(im2s))
    em32 = ego.get_ego_motion_batched(a1, a2, K, max_points=200,
                                      quality=0.001, lk_search=32)
    em24 = ego.get_ego_motion_batched(a1, a2, K, max_points=200,
                                      quality=0.001, lk_search=24)
    R32, R24 = np.asarray(em32.R), np.asarray(em24.R)
    for i, a in enumerate(angles):
        g32 = np.arcsin(np.clip(R32[i][0, 2], -1, 1))
        g24 = np.arcsin(np.clip(R24[i][0, 2], -1, 1))
        assert abs(g24 - a) < 5e-3, (i, g24, a)
        assert abs(g24 - g32) < 2e-3, (i, g24, g32)
