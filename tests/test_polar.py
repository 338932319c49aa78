"""Polar subsystem tests: the cartesian->polar->cartesian round trip
(cartesian2polar_testme, /root/reference/radial/cartesian2polar.lua:95-106),
flow2depth formula, and the radial matcher recovering a known 1-D shift."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.geometry3d import polar
from depth_estimation_tpu.models.radial import RadialFlowNetwork
import pytest


def smooth_image(h, w, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(h, w, 3).astype(np.float32)
    from depth_estimation_tpu.flow.celiu import gaussian_smooth
    return np.asarray(gaussian_smooth(jnp.asarray(img), 2.0, 6))


@pytest.mark.slow
def test_polar_roundtrip():
    img = smooth_image(96, 128)
    c2p = polar.get_c2p_grid(128, 96, 160, 100)
    pol = polar.cartesian2polar(jnp.asarray(img), c2p)
    p2c = polar.get_p2c_grid(160, 100, 128, 96)
    back = np.asarray(polar.warp_grid(pol, p2c))
    # compare in a disk around the center, away from center singularity
    yy, xx = np.mgrid[0:96, 0:128]
    r = np.sqrt((yy - 48.0) ** 2 + (xx - 64.0) ** 2)
    m = (r > 8) & (r < 40)
    err = np.abs(back - img)[m].mean()
    assert err < 0.02, err


def test_c2p_padding_wraps():
    g = np.asarray(polar.get_c2p_grid(64, 64, 80, 50, lpadding=3, rpadding=2))
    assert g.shape == (2, 50, 85)
    np.testing.assert_allclose(g[:, :, :3], g[:, :, 80:83])     # left pad = last cols
    np.testing.assert_allclose(g[:, :, 83:], g[:, :, 3:5])      # right pad = first cols


def test_rmax_farthest_corner():
    assert polar.get_rmax(60, 80, (0.0, 0.0)) == math.floor(math.hypot(80, 60))
    assert polar.get_rmax(60, 80, (40.0, 30.0)) == math.floor(math.hypot(40, 30))


def test_flow2depth_formula():
    h, w = 50, 60
    center = (30.0, 25.0)
    flow = np.full((h, w), 2.0, np.float32)
    depth, confs = polar.flow2depth(h, w, jnp.asarray(flow), center, 1.0)
    depth = np.asarray(depth)
    infty = polar.get_rmax(h, w, center)
    # at a pixel far from the center: depth = d / flow / infty
    i, j = 45, 50
    d = math.hypot(j - center[0], i - center[1])
    np.testing.assert_allclose(depth[i, j], d / 2.0 / infty, rtol=1e-5)
    # near the epipole: confidence 0
    assert np.asarray(confs)[30, 25] == 0
    # tiny flow -> infinity (1.0 after normalization)
    flow2 = np.full((h, w), 0.01, np.float32)
    depth2, _ = polar.flow2depth(h, w, jnp.asarray(flow2), center, 1.0)
    np.testing.assert_allclose(np.asarray(depth2)[i, j], 1.0)


def test_depth2color_shapes_and_range():
    d = jnp.asarray(np.random.RandomState(0).rand(20, 30).astype(np.float32))
    c = jnp.ones((20, 30), jnp.float32)
    rgb = np.asarray(polar.depth2color(d, c))
    assert rgb.shape == (3, 20, 30)
    assert rgb.min() >= -1e-6 and rgb.max() <= 1 + 1e-6


def test_radial_network_recovers_shift():
    """Identity-ish test: polar_prev shifted down by k rows must decode
    flow = k everywhere valid."""
    layers = ((1, 5, 5, 25), )
    net = RadialFlowNetwork(layers, h_win=6)
    # identity weights: features = raw 5x5 patch
    from depth_estimation_tpu.geometry import Geometry
    from depth_estimation_tpu.models.filters import identity_filter_params
    g = Geometry(layers=((1, 5, 5, 25),))
    params = identity_filter_params(g)

    rng = np.random.RandomState(1)
    H, W = 40, 32
    curr = rng.rand(H, W, 1).astype(np.float32)
    k_true = 3
    # prev[y] == curr[y + k]: radial outward flow of k rows
    prev = np.roll(curr, -k_true, axis=0)
    flow, cost = net.flow(params, jnp.asarray(prev), jnp.asarray(curr))
    f = np.asarray(flow)
    # interior (away from the roll wrap): exact
    assert (f[2:-10] == k_true).all(), np.unique(f[2:-10])
    assert np.asarray(cost)[2:-10].max() < 1e-6


def test_pad_output_centering():
    im = jnp.ones((2, 10, 12), jnp.float32)
    out = np.asarray(polar.pad_output(20, 20, im))
    assert out.shape == (2, 20, 20)
    assert out.sum() == 2 * 10 * 12
    # centered: reference ceil(dh/2)-1 0-based start = ceil(10/2)-1 = 4
    assert out[0, 4, 4] == 1 and out[0, 3, 4] == 0


def test_filter_output_trainer_gate():
    """filterOutputTrainer parity (radial_opticalflow_filtering.lua:3-8):
    WTA index plus exp(max logp) >= threshold confidence gate."""
    from depth_estimation_tpu.models.radial import RadialFlowNetwork
    logp = jnp.log(jnp.asarray([[0.7, 0.2, 0.1],
                                [0.4, 0.35, 0.25]], jnp.float32))
    idx, good = RadialFlowNetwork.filter_output_trainer(logp, 0.5)
    np.testing.assert_array_equal(np.asarray(idx), [0, 0])
    np.testing.assert_array_equal(np.asarray(good), [True, False])
