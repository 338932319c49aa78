"""Matcher op tests, modeled on the reference's analytic invariants:
brute-force SSD argmin equality (/root/reference/tests/test_multiscale.lua:135-166)
and WTA decode with middle tie-break (/root/reference/opticalflow_model.lua:153-161).
The fused Pallas kernel runs in interpret mode on CPU."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu import codecs
from depth_estimation_tpu.geometry import Geometry
from depth_estimation_tpu.ops import matching


def brute_force_ssd(f1, f2, maxh, maxw):
    H, W, K = f1.shape
    out = np.zeros((H, W, maxh * maxw), np.float32)
    for y in range(H):
        for x in range(W):
            for dy in range(maxh):
                for dx in range(maxw):
                    d = f1[y, x] - f2[y + dy, x + dx]
                    out[y, x, dy * maxw + dx] = np.sum(d * d)
    return out


@pytest.mark.parametrize("maxh,maxw,K", [(8, 8, 3), (5, 7, 10), (16, 1, 4)])
def test_match_ssd_brute_force(maxh, maxw, K):
    rng = np.random.RandomState(0)
    H, W = 6, 9
    f1 = rng.randn(H, W, K).astype(np.float32)
    f2 = rng.randn(H + maxh - 1, W + maxw - 1, K).astype(np.float32)
    got = np.asarray(matching.match_ssd(jnp.asarray(f1), jnp.asarray(f2), maxh, maxw))
    want = brute_force_ssd(f1, f2, maxh, maxw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_match_recovers_known_shift():
    """Identity-features trick: f2 is f1 shifted by a known displacement, so
    the WTA must recover it exactly (reference test_patches2 semantics)."""
    g = Geometry(maxh=8, maxw=8)
    rng = np.random.RandomState(1)
    H, W, K = 12, 14, 6
    big = rng.rand(H + g.maxh - 1, W + g.maxw - 1, K).astype(np.float32)
    # truth displacement (centered): dy=2, dx=-1
    dy_c, dx_c = 2, -1
    dy_w, dx_w = dy_c + g.halfh1, dx_c + g.halfw1
    f1 = big[dy_w:dy_w + H, dx_w:dx_w + W]
    costs = matching.match_ssd(jnp.asarray(f1), jnp.asarray(big), g.maxh, g.maxw)
    idx = matching.wta_from_costs(costs, codecs.middle_index(g))
    ry, rx = codecs.decode(g, idx)
    assert np.all(np.asarray(ry) == dy_c)
    assert np.all(np.asarray(rx) == dx_c)


def test_wta_middle_tiebreak():
    g = Geometry(maxh=4, maxw=4)
    mid = codecs.middle_index(g)
    D = g.maxh * g.maxw
    costs = np.ones((2, 2, D), np.float32)
    # pixel (0,0): unique min away from middle -> picks it
    costs[0, 0, 3] = 0.1
    # pixel (0,1): min tie between cell 2 and middle -> picks middle
    costs[0, 1, 2] = 0.5
    costs[0, 1, mid] = 0.5
    # pixel (1,0): middle is the unique min
    costs[1, 0, mid] = 0.0
    idx = np.asarray(matching.wta_from_costs(jnp.asarray(costs), mid))
    assert idx[0, 0] == 3
    assert idx[0, 1] == mid
    assert idx[1, 0] == mid


def _fused_interpret(f1, f2, maxh, maxw, block_rows=4):
    return matching.match_flow_fused(
        jnp.asarray(f1), jnp.asarray(f2), maxh, maxw, block_rows, True
    )


@pytest.mark.parametrize("maxh,maxw", [(8, 8), (5, 7)])
def test_fused_matches_reference_path(maxh, maxw):
    rng = np.random.RandomState(2)
    H, W, K = 10, 16, 5
    f1 = rng.randn(H, W, K).astype(np.float32)
    f2 = rng.randn(H + maxh - 1, W + maxw - 1, K).astype(np.float32)

    costs = matching.match_ssd(jnp.asarray(f1), jnp.asarray(f2), maxh, maxw)
    mid = (math.ceil(maxh / 2) - 1) * maxw + (math.ceil(maxw / 2) - 1)
    want_idx = np.asarray(matching.wta_from_costs(costs, mid))
    p = np.asarray(matching.softmax_scores(costs))
    off_y = np.arange(maxh * maxw) // maxw - (math.ceil(maxh / 2) - 1)
    off_x = np.arange(maxh * maxw) % maxw - (math.ceil(maxw / 2) - 1)
    want_ey = (p * off_y).sum(-1)
    want_ex = (p * off_x).sum(-1)
    want_pmax = p.max(-1)

    idx, ey, ex, pmax = _fused_interpret(f1, f2, maxh, maxw)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(ey), want_ey, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ex), want_ex, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pmax), want_pmax, rtol=1e-4, atol=1e-5)


def test_fused_row_padding():
    """H not a multiple of block_rows exercises the padding path."""
    maxh = maxw = 4
    rng = np.random.RandomState(3)
    H, W, K = 7, 9, 3
    f1 = rng.randn(H, W, K).astype(np.float32)
    f2 = rng.randn(H + maxh - 1, W + maxw - 1, K).astype(np.float32)
    costs = matching.match_ssd(jnp.asarray(f1), jnp.asarray(f2), maxh, maxw)
    mid = (math.ceil(maxh / 2) - 1) * maxw + (math.ceil(maxw / 2) - 1)
    want_idx = np.asarray(matching.wta_from_costs(costs, mid))
    idx, *_ = _fused_interpret(f1, f2, maxh, maxw, block_rows=4)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_radial_matching():
    hwin = 6
    rng = np.random.RandomState(4)
    H, W, K = 8, 10, 4
    f1 = rng.randn(H, W, K).astype(np.float32)
    f2 = rng.randn(H + hwin - 1, W, K).astype(np.float32)
    got = np.asarray(matching.match_ssd_radial(jnp.asarray(f1), jnp.asarray(f2), hwin))
    want = brute_force_ssd(f1, f2, hwin, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fast_kernel_agrees_with_fused():
    """Norm-decomposed fast path decodes identically on non-degenerate
    inputs (interpret mode, small size)."""
    maxh = maxw = 8
    rng = np.random.RandomState(7)
    g1 = jnp.asarray(rng.rand(16, 20, 6), np.float32)
    g2 = jnp.asarray(rng.rand(23, 27, 6), np.float32)
    i1, y1, x1, p1 = matching.match_flow_fused(g1, g2, maxh, maxw, 8, True)
    i2, y2, x2, p2 = matching.match_flow_fast(g1, g2, maxh, maxw, 8, True)
    assert (np.asarray(i1) == np.asarray(i2)).mean() > 0.99
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)




def test_entropy_mask():
    from depth_estimation_tpu.ops import extract
    peaked = np.zeros(16, np.float32); peaked[3] = 1.0
    flat = np.full(16, 1 / 16, np.float32)
    m = np.asarray(extract.entropy_mask(
        jnp.asarray(np.stack([peaked, flat])), threshold=1.0))
    assert m[0] and not m[1]


def test_fused_marginal_output():
    """want_marg=True appends the normalized y-marginal (sum over dx of the
    softmax), matching the marginalization in getOutputConfidences2
    (/root/reference/opticalflow_model.lua:192-193)."""
    maxh, maxw = 6, 4
    rng = np.random.RandomState(7)
    H, W, K = 9, 12, 5
    f1 = rng.randn(H, W, K).astype(np.float32)
    f2 = rng.randn(H + maxh - 1, W + maxw - 1, K).astype(np.float32)

    costs = matching.match_ssd(jnp.asarray(f1), jnp.asarray(f2), maxh, maxw)
    p = np.asarray(matching.softmax_scores(costs))
    want_marg = p.reshape(H, W, maxh, maxw).sum(-1)       # (H, W, maxh)

    idx, ey, ex, pmax, marg = matching.match_flow_fused(
        jnp.asarray(f1), jnp.asarray(f2), maxh, maxw, 4, True, True)
    assert marg.shape == (maxh, H, W)
    np.testing.assert_allclose(np.moveaxis(np.asarray(marg), 0, -1),
                               want_marg, rtol=1e-4, atol=1e-5)
    # and the base outputs are unchanged by the extra output
    idx0, ey0, ex0, pmax0 = matching.match_flow_fused(
        jnp.asarray(f1), jnp.asarray(f2), maxh, maxw, 4, True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx0))
    np.testing.assert_allclose(np.asarray(ey), np.asarray(ey0), rtol=1e-6)


def test_entropy_mask_exact_values_and_monotonicity():
    """entropy_mask thresholds Shannon entropy of the window distribution:
    uniform over n cells has entropy exactly ln(n); mixing a peaked
    distribution toward uniform increases entropy monotonically."""
    from depth_estimation_tpu.ops import extract
    n = 64
    uniform = np.full(n, 1.0 / n, np.float32)
    # exact boundary: ln(64) = 4.1589; threshold just below/above
    ln_n = float(np.log(n))
    m_below = np.asarray(extract.entropy_mask(
        jnp.asarray(uniform[None]), threshold=ln_n - 1e-3))
    m_above = np.asarray(extract.entropy_mask(
        jnp.asarray(uniform[None]), threshold=ln_n + 1e-3))
    assert not m_below[0] and m_above[0]
    # monotonicity in the mixing coefficient
    peak = np.zeros(n, np.float32)
    peak[7] = 1.0
    hs = []
    for lam in (0.0, 0.25, 0.5, 0.75, 1.0):
        p = (1 - lam) * peak + lam * uniform
        p = p / p.sum()
        pc = np.clip(p, 1e-12, 1.0)
        hs.append(float(-(pc * np.log(pc)).sum()))
        # mask agrees with the hand-computed entropy on both sides
        for eps in (-1e-3, 1e-3):
            m = np.asarray(extract.entropy_mask(
                jnp.asarray(p[None]), threshold=hs[-1] + eps))
            assert bool(m[0]) == (eps > 0)
    assert all(a < b for a, b in zip(hs, hs[1:]))


def test_fused_kernel_bf16_parity():
    """The bf16 feature path of match_flow_fused must agree with f32 on the
    WTA index nearly everywhere and on soft-argmax within bf16 tolerance."""
    from depth_estimation_tpu.ops import matching
    rng = np.random.RandomState(7)
    maxh = maxw = 8
    H, W, K = 24, 32, 6
    f1 = jnp.asarray(rng.rand(H, W, K), jnp.float32)
    f2 = jnp.asarray(rng.rand(H + maxh - 1, W + maxw - 1, K), jnp.float32)
    o32 = matching.match_flow_fused(f1, f2, maxh, maxw, 8, True)
    o16 = matching.match_flow_fused(f1, f2, maxh, maxw, 16, True, False,
                                    jnp.bfloat16)
    idx_agree = (np.asarray(o32[0]) == np.asarray(o16[0])).mean()
    assert idx_agree > 0.9, idx_agree
    np.testing.assert_allclose(np.asarray(o32[1]), np.asarray(o16[1]),
                               atol=0.25)
    np.testing.assert_allclose(np.asarray(o32[3]), np.asarray(o16[3]),
                               atol=0.05)




@pytest.mark.slow
def test_kernels_f16_parity():
    """f16 feature STORAGE (10 mantissa bits at bf16's 2-byte traffic) must
    agree with f32 much tighter than bf16 does. Contract test on random
    features; the trained-model EPE budget call (0.0065 px in interpret
    mode, quality dossier) additionally needs the on-chip precision run —
    interpret-mode precision has disagreed with the chip before (fast
    bf16: ~1 px on-chip vs 0.05 px interpret on identical code)."""
    from depth_estimation_tpu.ops import matching
    rng = np.random.RandomState(7)
    maxh = maxw = 8
    H, W, K = 24, 32, 6
    f1 = jnp.asarray(rng.rand(H, W, K), jnp.float32)
    f2 = jnp.asarray(rng.rand(H + maxh - 1, W + maxw - 1, K), jnp.float32)
    o32 = matching.match_flow_fused(f1, f2, maxh, maxw, 8, True)
    for o16 in (
            matching.match_flow_fused(f1, f2, maxh, maxw, 16, True, False,
                                      jnp.float16),
            matching.match_flow_fast(f1, f2, maxh, maxw, 16, True,
                                     jnp.float16)):
        idx_agree = (np.asarray(o32[0]) == np.asarray(o16[0])).mean()
        assert idx_agree > 0.97, idx_agree
        np.testing.assert_allclose(np.asarray(o32[2]), np.asarray(o16[2]),
                                   atol=0.05)


@pytest.mark.slow
def test_fast_kernel_bf16_parity():
    """bf16 feature storage in match_flow_fast agrees with the f32 fused
    kernel on nearly all WTA indices and on soft-argmax within tolerance
    (the bench.py headline configuration)."""
    from depth_estimation_tpu.ops import matching
    rng = np.random.RandomState(11)
    maxh = maxw = 8
    H, W, K = 32, 40, 6
    f1 = jnp.asarray(rng.rand(H, W, K), jnp.float32)
    f2 = jnp.asarray(rng.rand(H + maxh - 1, W + maxw - 1, K), jnp.float32)
    o32 = matching.match_flow_fused(f1, f2, maxh, maxw, 8, True)
    of = matching.match_flow_fast(f1, f2, maxh, maxw, 32, True,
                                  jnp.bfloat16)
    agree = (np.asarray(o32[0]) == np.asarray(of[0])).mean()
    assert agree > 0.9, agree
    np.testing.assert_allclose(np.asarray(o32[2]), np.asarray(of[2]),
                               atol=0.25)


@pytest.mark.slow
def test_fast_kernel_large_magnitude_features():
    """Regression: trained feature maps reach costs of hundreds; the
    norm-decomposed kernel's softmax must not underflow to s = 0 / NaN
    (caught by the quality dossier on a trained model — fixed with
    flash-style rescaling, matching _fused_kernel)."""
    rng = np.random.RandomState(13)
    maxh = maxw = 8
    H, W, K = 24, 32, 10
    f1 = jnp.asarray(rng.randn(H, W, K) * 30.0, jnp.float32)
    f2 = jnp.asarray(rng.randn(H + maxh - 1, W + maxw - 1, K) * 30.0,
                     jnp.float32)
    i_fast, y_fast, x_fast, p_fast = matching.match_flow_fast(
        f1, f2, maxh, maxw, 8, True)
    assert np.isfinite(np.asarray(y_fast)).all()
    assert np.isfinite(np.asarray(x_fast)).all()
    assert np.isfinite(np.asarray(p_fast)).all()
    i_ref, y_ref, x_ref, p_ref = matching.match_flow_fused(
        f1, f2, maxh, maxw, 8, True)
    assert (np.asarray(i_fast) == np.asarray(i_ref)).mean() > 0.99
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(p_fast), np.asarray(p_ref),
                               atol=1e-3)


def test_fused_block_rows_is_pure_blocking():
    """block_rows only tiles the row grid — every output must be identical
    across block sizes (the benches rely on this to run block 32)."""
    import jax.numpy as jnp
    maxh, maxw = 6, 4
    rng = np.random.RandomState(13)
    H, W, K = 40, 24, 5
    f1 = rng.randn(H, W, K).astype(np.float32)
    f2 = rng.randn(H + maxh - 1, W + maxw - 1, K).astype(np.float32)
    ref = matching.match_flow_fused(jnp.asarray(f1), jnp.asarray(f2),
                                    maxh, maxw, 4, True)
    for block in (8, 32, 64):
        out = matching.match_flow_fused(jnp.asarray(f1), jnp.asarray(f2),
                                        maxh, maxw, block, True)
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_conf_gate_matches_marginal_extraction():
    """want_conf=True appends the 'mean'-head confidence gate computed
    in-kernel; it must equal confidences_from_marginal on the want_marg
    output (the extract_output score is > 0 iff any marginal entry clears
    the threshold — all rank weights are positive)."""
    import jax.numpy as jnp
    from depth_estimation_tpu.ops import extract
    maxh, maxw = 6, 4
    rng = np.random.RandomState(11)
    H, W, K = 9, 12, 5
    # small feature magnitudes -> soft distributions that straddle the
    # threshold (both gate outcomes exercised)
    f1 = (0.3 * rng.randn(H, W, K)).astype(np.float32)
    f2 = (0.3 * rng.randn(H + maxh - 1, W + maxw - 1, K)).astype(np.float32)
    wants = []
    for thr in (0.11, 0.2):
        idx, ey, ex, pmax, marg = matching.match_flow_fused(
            jnp.asarray(f1), jnp.asarray(f2), maxh, maxw, 4, True, True)
        want = np.asarray(extract.confidences_from_marginal(
            jnp.moveaxis(jnp.asarray(marg), 0, -1), thr))
        outs = matching.match_flow_fused(
            jnp.asarray(f1), jnp.asarray(f2), maxh, maxw, 4, True, False,
            jnp.float32, True, thr)
        conf = np.asarray(outs[4])
        assert conf.shape == (H, W)
        assert set(np.unique(conf)) <= {0.0, 1.0}
        np.testing.assert_array_equal(conf > 0.5, want)
        wants.append(want)
    # both outcomes exercised somewhere across the thresholds
    assert any(0 < w.sum() < w.size for w in wants)
