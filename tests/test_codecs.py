"""Codec round-trip invariants, ported from the reference test suite:
/root/reference/tests/test_multiscale.lua:58-81 (x2yx/yx2x round trips) plus
exactness checks of the scalar band arithmetic against the vectorized LUTs."""

import math

import numpy as np
import pytest

from depth_estimation_tpu import codecs
from depth_estimation_tpu.geometry import Geometry


def g_single(maxh=16, maxw=16):
    return Geometry(maxh=maxh, maxw=maxw)


def g_multi(maxh=8, maxw=8, ratios=(1, 2)):
    return Geometry(maxh=maxh, maxw=maxw, multiscale=True, ratios=ratios)


@pytest.mark.parametrize("maxh,maxw", [(16, 16), (17, 17), (8, 12), (1, 5)])
def test_single_roundtrip(maxh, maxw):
    g = g_single(maxh, maxw)
    for dy in range(-g.halfh1, g.halfh2 + 1):
        for dx in range(-g.halfw1, g.halfw2 + 1):
            flat = codecs.yx2x(g, dy, dx)
            assert 0 <= flat < maxh * maxw
            ry, rx = codecs.x2yx(g, flat)
            assert (ry, rx) == (dy, dx)


def test_single_middle_index():
    g = g_single(16, 16)
    mid = codecs.middle_index(g)
    dy, dx = codecs.x2yx(g, mid)
    assert (dy, dx) == (0, 0)
    # reference 1-based formula: (ceil(16/2)-1)*16 + ceil(16/2) = 7*16+8 = 120
    assert mid + 1 == 120


@pytest.mark.parametrize("ratios", [(1, 2), (1, 2, 4)])
@pytest.mark.parametrize("maxh,maxw", [(8, 8), (16, 16)])
def test_multi_roundtrip_displacements(maxh, maxw, ratios):
    """Port of /root/reference/tests/test_multiscale.lua:58-70: encode/decode
    every displacement in the coarsest window; error < tolerance of the scale
    that covers it."""
    g = g_multi(maxh, maxw, ratios)
    mh, mw = maxh * ratios[-1], maxw * ratios[-1]
    for i in range(-math.ceil(mh / 2) + 1, math.floor(mh / 2) + 1):
        for j in range(-math.ceil(mw / 2) + 1, math.floor(mw / 2) + 1):
            flat = codecs.yx2x_multi_scalar(g, i, j)
            y, x = codecs.x2yx_multi_scalar(g, flat)
            tol = None
            for r in ratios:
                if abs(i) < maxh * r and abs(j) < maxw * r:
                    tol = r
            assert tol is not None
            assert abs(y - i) < tol and abs(x - j) < tol, (i, j, y, x, tol)


@pytest.mark.parametrize("ratios", [(1, 2), (1, 2, 4)])
def test_multi_roundtrip_indices(ratios):
    """Port of /root/reference/tests/test_multiscale.lua:72-81: every flat
    index decodes and re-encodes to itself; count matches the analytic total."""
    g = g_multi(8, 8, ratios)
    maxx = codecs.n_indices(g)
    expected = 8 * 8
    for i in range(1, len(ratios)):
        expected += int(8 * 8 * (1 - (ratios[i - 1] / ratios[i]) ** 2))
    assert maxx == expected
    for flat in range(maxx):
        y, x = codecs.x2yx_multi_scalar(g, flat)
        assert codecs.yx2x_multi_scalar(g, y, x) == flat


def test_luts_match_scalar():
    g = g_multi(8, 8, (1, 2, 4))
    lut = codecs.decode_lut(g)
    assert lut.shape == (codecs.n_indices(g), 2)
    for flat in range(lut.shape[0]):
        assert tuple(lut[flat]) == codecs.x2yx_multi_scalar(g, flat)

    # vectorized encode/decode agree with scalar on a random batch
    rng = np.random.RandomState(0)
    n = 500
    mh, mw = 8 * 4, 8 * 4
    dy = rng.randint(-math.ceil(mh / 2) + 1, math.floor(mh / 2) + 1, size=n)
    dx = rng.randint(-math.ceil(mw / 2) + 1, math.floor(mw / 2) + 1, size=n)
    enc = np.asarray(codecs.encode(g, dy, dx))
    for k in range(n):
        assert enc[k] == codecs.yx2x_multi_scalar(g, int(dy[k]), int(dx[k]))
    ry, rx = codecs.decode(g, enc)
    ry, rx = np.asarray(ry), np.asarray(rx)
    for k in range(n):
        ey, ex = codecs.x2yx_multi_scalar(g, int(enc[k]))
        assert (ry[k], rx[k]) == (ey, ex)


def test_window_offsets_single():
    g = g_single(5, 7)
    off = np.asarray(codecs.window_offsets(g))
    assert off.shape == (35, 2)
    k = 0
    for dy in range(-g.halfh1, g.halfh2 + 1):
        for dx in range(-g.halfw1, g.halfw2 + 1):
            assert tuple(off[k]) == (dy, dx)
            k += 1


def test_default_geometry_canonical_config():
    """default_geometry builds the reference's canonical single-scale
    config and validates it."""
    from depth_estimation_tpu.geometry import default_geometry
    g = default_geometry()
    assert (g.hImg, g.wImg) == (180, 320)
    assert g.maxh == g.maxw == 16
    g2 = default_geometry(maxh=8, maxw=8)
    assert g2.maxh == 8
