"""Streaming API + post-processing tests: the nextFrameDepth contract
(/root/reference/depth_estimation_api.lua:134-198 and
tests/test_depth_estimation_api.lua) on a synthetic translating sequence,
plus the masked mode/median window filters."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.api import DepthEstimator
from depth_estimation_tpu.geometry import Geometry
from depth_estimation_tpu.geometry3d import calibration
from depth_estimation_tpu.models.filters import identity_filter_params
from depth_estimation_tpu.ops import postprocess


def small_cal(h, w):
    return dataclasses.replace(
        calibration.RECTIFIED_GOPRO_SMALL, wImg=w, hImg=h,
        fx=100.0, fy=100.0, cx=w / 2, cy=h / 2)


def test_next_frame_depth_recovers_translation():
    g = Geometry(hImg=64, wImg=80, layers=((3, 6, 6, 6 * 6 * 3),),
                 maxh=8, maxw=8)
    cal = small_cal(64, 80)
    params = identity_filter_params(g)
    est = DepthEstimator(g, params, cal, head="max")

    from depth_estimation_tpu.flow.celiu import gaussian_smooth
    rng = np.random.RandomState(0)
    big = np.asarray(gaussian_smooth(
        jnp.asarray(rng.rand(90, 110, 3).astype(np.float32)), 1.0, 3))
    dx = 2
    f0 = big[10:74, 10:90]
    f1 = big[10:74, 10 + dx:90 + dx]   # camera pans right: flow = -dx? frame1
    est.reset(f0)
    im_scaled, xflow, mask = est.next_frame_depth(f1)
    assert im_scaled.shape == (64, 80, 3)
    assert xflow.shape == (64, 80)
    assert mask.shape == (64, 80)
    sel = mask > 0.5
    assert sel.sum() > 200
    med = np.median(xflow[sel])
    # pure translation: ego-motion R ~ I can absorb some flow into rotation
    # compensation; require the dominant surviving flow to be consistent
    assert abs(abs(med) - dx) <= 2.1, med


def test_bad_frame_rejected():
    g = Geometry(hImg=48, wImg=64, layers=((3, 5, 5, 75),), maxh=6, maxw=6)
    cal = small_cal(48, 64)
    params = identity_filter_params(g)
    est = DepthEstimator(g, params, cal)
    rng = np.random.RandomState(1)
    f0 = rng.rand(48, 64, 3).astype(np.float32)
    f1 = rng.rand(48, 64, 3).astype(np.float32)   # unrelated noise frame
    est.reset(f0)
    im_scaled, xflow, mask = est.next_frame_depth(f1)
    # either rejected (zeros) or heavily masked; the reference zeroes output
    if mask.max() == 0:
        assert np.abs(xflow).max() == 0
    t = est.timers.means()
    assert "frame" in t


def test_mode_filter_majority():
    flow = np.zeros((2, 12, 12), np.float32)
    flow[0, :, :] = 1.0
    flow[1, :, :] = 2.0
    flow[0, 5, 5] = 7.0   # outlier
    mask = np.ones((12, 12), np.float32)
    out = np.asarray(postprocess.mode_filter(jnp.asarray(flow),
                                             jnp.asarray(mask), 4))
    # interior takes the window mode (1, 2); outlier removed
    assert out[0, 6, 6] == 1.0 and out[1, 6, 6] == 2.0
    assert out[0, 5, 5] == 1.0


def test_median_filter_masked():
    flow = np.zeros((2, 10, 10), np.float32)
    flow[0] = 3.0
    mask = np.ones((10, 10), np.float32)
    flow[0, 4, 4] = 100.0   # outlier
    mask[4, 4] = 0          # ... but masked out
    out = np.asarray(postprocess.median_filter(jnp.asarray(flow),
                                               jnp.asarray(mask), 3))
    inner = out[0, 1:-2, 1:-2]
    assert (inner == 3.0).all()


def test_ego_resolution_working_agrees_with_full():
    """The working-resolution ego-motion fast path must recover the same
    physical rotation as the full-resolution path (sub-degree agreement on a
    synthetic pure-rotation pair)."""
    import jax.numpy as jnp
    from depth_estimation_tpu.geometry3d import egomotion as ego
    from depth_estimation_tpu.geometry3d import undistort as undist
    from depth_estimation_tpu.data.images import scale as img_scale
    from depth_estimation_tpu.flow.celiu import gaussian_smooth

    rng = np.random.RandomState(5)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    img = np.asarray(gaussian_smooth(
        jnp.asarray(rng.rand(480, 640, 3).astype(np.float32)), 1.5, 5))
    # small pure rotation about y (pan)
    ang = np.deg2rad(1.2)
    R_true = np.array([[np.cos(ang), 0, np.sin(ang)],
                       [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    img2 = np.asarray(undist.remove_ego_motion(jnp.asarray(img), K, R_true.T))

    def angle(R):
        return np.degrees(np.arccos(np.clip((np.trace(np.asarray(R)) - 1) / 2,
                                            -1, 1)))

    em_full = ego.get_ego_motion(jnp.asarray(img), jnp.asarray(img2), K,
                                 max_points=300, quality=0.001)
    sK = K.copy()
    sK[0] *= 0.5
    sK[1] *= 0.5
    s1 = img_scale(jnp.asarray(img), 240, 320)
    s2 = img_scale(jnp.asarray(img2), 240, 320)
    em_work = ego.get_ego_motion(s1, s2, sK, max_points=300, quality=0.001)
    # both estimates close to the true 1.2 deg rotation
    assert abs(angle(em_full.R) - 1.2) < 0.4, angle(em_full.R)
    assert abs(angle(em_work.R) - 1.2) < 0.4, angle(em_work.R)
    # and they agree with each other sub-degree
    dR = np.asarray(em_full.R) @ np.asarray(em_work.R).T
    assert angle(dR) < 0.6


def test_pipelined_stream_matches_sync_path():
    """api.PipelinedStream (est.stream): results come out in frame order,
    lag frames behind the pushes, numerically identical to the synchronous
    next_frame_packed sequence on the same frames (the overlap changes
    scheduling, never values — same jitted program, same state rotation)."""
    g = Geometry(hImg=48, wImg=64, layers=((3, 5, 5, 75),), maxh=6, maxw=6)
    cal = small_cal(48, 64)
    params = identity_filter_params(g)

    from depth_estimation_tpu.flow.celiu import gaussian_smooth
    rng = np.random.RandomState(0)
    big = np.asarray(gaussian_smooth(
        jnp.asarray(rng.rand(70, 100, 3).astype(np.float32)), 1.0, 3))
    frames = [big[10:58, 10 + k:74 + k] for k in range(7)]

    est = DepthEstimator(g, params, cal, head="max")
    est.reset(frames[0])
    ref = [np.asarray(est.next_frame_packed(f)) for f in frames[1:]]

    est2 = DepthEstimator(g, params, cal, head="max")
    est2.reset(frames[0])
    got = []
    with est2.stream(lag=3) as stream:
        for f in frames[1:]:
            out = stream.push(f)
            if out is not None:
                got.append(out)
        got.extend(stream.drain())
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
