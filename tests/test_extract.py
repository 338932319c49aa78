"""Property tests for the confidence extraction ops against a literal numpy
port of the C scan (/root/reference/extract_output.cpp:63-155,157-255) —
same pattern as the SOR equivalence test in test_celiu.py."""

import numpy as np
import jax.numpy as jnp

from depth_estimation_tpu.ops import extract


def _c_scan(dist: np.ndarray, threshold: float):
    """Literal port of the ExtractOutput C loop: first-maxhighs scan-order
    collect, descending sort, cumsum-then-sum score, argmax-of-kept index.
    Returns (idx, score) with idx 0-based (framework convention) and the
    no-entry pixels defined as (argmax, 0) — the framework's saner choice
    for the reference's uninitialized outputs."""
    maxhighs = 8 if threshold < 0.2 else 4
    h, w = dist.shape[:2]
    idx = np.zeros((h, w), np.int32)
    score = np.zeros((h, w), np.float64)
    for i in range(h):
        for j in range(w):
            vals, inds, n = [], [], 0
            for k in range(dist.shape[2]):
                if dist[i, j, k] > threshold:
                    vals.append(dist[i, j, k])
                    inds.append(k)
                    n += 1
                    if n == maxhighs:
                        break
            if not n:
                idx[i, j] = int(np.argmax(dist[i, j]))
                continue
            vals = vals + [0.0] * (maxhighs - n)
            inds = inds + [0] * (maxhighs - n)
            order = sorted(range(maxhighs), key=lambda a: -vals[a])
            svals = [vals[a] for a in order]
            idx[i, j] = inds[order[0]]
            # cumsum then sum (extract_output.cpp:121-129)
            c = np.cumsum(svals)
            score[i, j] = c.sum()
    return idx, score


def test_extract_output_matches_c_scan():
    rng = np.random.RandomState(0)
    # softmax-like distributions over 64 cells
    logits = rng.randn(13, 17, 64).astype(np.float32) * 4
    dist = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    for th in (0.11, 0.21):
        ref_idx, ref_score = _c_scan(dist, th)
        idx, score = extract.extract_output(jnp.asarray(dist), th)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(score), ref_score, rtol=1e-5,
                                   atol=1e-6)


def test_extract_output_scan_order_beyond_k():
    """When more than max_highs entries clear the threshold the reference
    keeps the FIRST ones in scan order — including dropping a later, larger
    value. The op must reproduce that."""
    d = np.full((1, 1, 16), 0.001, np.float32)
    d[0, 0, :8] = 0.112          # eight early just-above-threshold entries
    d[0, 0, 12] = 0.5            # a later, much larger one — must be dropped
    ref_idx, ref_score = _c_scan(d, 0.11)
    idx, score = extract.extract_output(jnp.asarray(d), 0.11)
    assert int(idx[0, 0]) == ref_idx[0, 0] == 0
    np.testing.assert_allclose(float(score[0, 0]), ref_score[0, 0], rtol=1e-5)


def test_extract_output_marginalized_matches_c_scan():
    rng = np.random.RandomState(1)
    logits = rng.randn(9, 11, 48).astype(np.float32) * 4
    dist = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    th = 0.11
    ref_idx, ref_score = _c_scan(dist, th)
    th_acc = float(np.median(ref_score))   # guarantee both classes appear
    ref_good = (ref_score >= th_acc).astype(np.int32)
    idx, good = extract.extract_output_marginalized(jnp.asarray(dist), th,
                                                    th_acc)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_array_equal(np.asarray(good), ref_good)
    assert np.asarray(good).sum() > 0
    assert (np.asarray(good) == 0).sum() > 0


def test_mean_head_confidences_uses_y_marginal():
    """getOutputConfidences2 extracts on the y-marginal (sum over maxw):
    a pixel whose joint max is below threshold but whose marginal clears it
    must be confident."""
    maxh, maxw = 4, 4
    d = np.full((1, 1, 16), 1.0 / 16.0, np.float32)  # joint max 0.0625 < 0.11
    gds = extract.mean_head_confidences(jnp.asarray(d), maxh, maxw)
    # marginal is uniform 0.25 > 0.11 -> confident
    assert bool(gds[0, 0])
    # concentrated on one cell: marginal has one 1.0 entry -> confident
    d2 = np.zeros((1, 1, 16), np.float32)
    d2[0, 0, 5] = 1.0
    assert bool(extract.mean_head_confidences(jnp.asarray(d2), maxh, maxw)[0, 0])
    # adversarial: every marginal entry below threshold is impossible for a
    # probability distribution with maxh*0.11 < 1 only when maxh >= 10
    marg = np.asarray(d).reshape(1, 1, maxh, maxw).sum(-1)
    assert marg.max() > 0.11
