"""Single-scale model tests: the reference's identity-kernel analytic trick
(/root/reference/tests/test_patches2.lua:44-54) — with one-hot first-layer
weights the features equal raw pixels, so the model's match must recover a
known shift exactly — plus prepareTarget/processOutput conventions."""

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu import codecs
from depth_estimation_tpu.geometry import Geometry, Learning
from depth_estimation_tpu.models import flow
from depth_estimation_tpu.models.filters import identity_filter_params
from depth_estimation_tpu.ops import extract


def make_geometry():
    # identity filter: single layer, cout = kh*kw*cin
    return Geometry(
        hImg=40, wImg=48,
        layers=((3, 8, 8, 8 * 8 * 3),),
        maxh=8, maxw=8,
    )


def test_identity_model_recovers_shift():
    g = make_geometry()
    model = flow.FlowModel(g)
    params = identity_filter_params(g)

    rng = np.random.RandomState(0)
    img2 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)
    dy_c, dx_c = 3, -2
    # img1 such that img1[y, x] == img2[y + dy, x + dx]: true flow = (dy, dx)
    img1 = np.zeros_like(img2)
    img1[:, :] = np.roll(np.roll(img2, -dy_c, axis=0), -dx_c, axis=1)

    dist = model.scores(params, jnp.asarray(img1), jnp.asarray(img2))
    out = flow.process_output(g, dist, process_full=False)
    y = np.asarray(out.y)
    x = np.asarray(out.x)
    # interior pixels (away from the roll wrap-around) must be exact
    assert (y[4:-4, 4:-4] == dy_c).all()
    assert (x[4:-4, 4:-4] == dx_c).all()


def test_fused_path_agrees_with_scores_path():
    g = make_geometry()
    model = flow.FlowModel(g)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    img1 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3), jnp.float32)

    dist = model.scores(params, img1, img2)
    want = flow.process_output(g, dist, process_full=False)
    ey_want, ex_want = flow.soft_argmax(g, dist)

    idx, ey, ex, pmax = model.forward_fused.__wrapped__(
        model, params, img1, img2
    ) if hasattr(model.forward_fused, "__wrapped__") else model.forward_fused(
        params, img1, img2
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want.index))
    np.testing.assert_allclose(np.asarray(ey), np.asarray(ey_want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(ex_want), atol=1e-4)


def test_prepare_target_clamps_and_encodes():
    g = Geometry(maxh=8, maxw=8)
    lrn = Learning()
    # inside window
    it, t = flow.prepare_target(g, lrn, jnp.array([2.0, -1.0]))
    assert int(it) == codecs.yx2x(g, 2, -1)
    # outside -> flat pixel (0,0)
    it2, _ = flow.prepare_target(g, lrn, jnp.array([100.0, 0.0]))
    assert int(it2) == codecs.middle_index(g)
    # boundary asymmetry: dy = floor(maxh/2) = 4 is inside, dy = -4 is outside
    it3, _ = flow.prepare_target(g, lrn, jnp.array([4.0, 0.0]))
    assert int(it3) == codecs.yx2x(g, 4, 0)
    it4, _ = flow.prepare_target(g, lrn, jnp.array([-4.0, 0.0]))
    assert int(it4) == codecs.middle_index(g)


def test_prepare_target_soft():
    g = Geometry(maxh=4, maxw=4)
    lrn = Learning(soft_targets=True, st_sigma2=1.0)
    it, tgt = flow.prepare_target(g, lrn, jnp.array([1.0, 0.0]))
    tgt = np.asarray(tgt)
    assert tgt.shape == (16,)
    # peak at the target cell, value 1
    assert tgt.argmax() == int(it)
    np.testing.assert_allclose(tgt[int(it)], 1.0)
    # exact Gaussian at a neighbor
    off = np.asarray(codecs.window_offsets(g))
    for d in range(16):
        d2 = (1.0 - off[d, 0]) ** 2 + (0.0 - off[d, 1]) ** 2
        np.testing.assert_allclose(tgt[d], np.exp(-d2), rtol=1e-5)


def test_process_output_full_assembly():
    g = Geometry(hImg=20, wImg=24, maxh=4, maxw=4, layers=((3, 5, 5, 6),))
    H = g.hImg - g.maxh + 1 - g.hKernel + 1
    W = g.wImg - g.maxw + 1 - g.wKernel + 1
    rng = np.random.RandomState(2)
    dist = jax.nn.softmax(jnp.asarray(rng.rand(H, W, 16), jnp.float32), axis=-1)
    out = flow.process_output(g, dist, process_full=True)
    assert out.full.shape == (2, 20, 24)
    hoff = (20 - H) // 2
    woff = (24 - W) // 2
    full = np.asarray(out.full)
    assert (full[:, :hoff, :] == 0).all()
    np.testing.assert_array_equal(
        full[0, hoff:hoff + H, woff:woff + W], np.asarray(out.y)
    )


def test_extract_output_scores():
    dist = jnp.asarray([[0.5, 0.3, 0.1, 0.05, 0.05],
                        [0.05, 0.05, 0.05, 0.05, 0.8]], jnp.float32)
    idx, score = extract.extract_output(dist[None], threshold=0.11)
    idx, score = np.asarray(idx)[0], np.asarray(score)[0]
    assert idx[0] == 0 and idx[1] == 4
    # row 0: values > 0.11 sorted: [0.5, 0.3]; score = 8*0.5 + 7*0.3 = 6.1
    np.testing.assert_allclose(score[0], 6.1, rtol=1e-5)
    np.testing.assert_allclose(score[1], 8 * 0.8, rtol=1e-5)


def test_enlarge_mask_erosion():
    mask = np.ones((8, 8), np.float32)
    mask[4, 4] = 0
    got = np.asarray(extract.enlarge_mask(jnp.asarray(mask), 3, 3))
    # the 3x3 neighborhood of (4,4) is now invalid
    assert not got[3:6, 3:6].any()
    assert got[1, 1]
    # borders are invalid (out-of-frame counts as invalid)
    assert not got[0, :].any()


def test_sparse_conv_map_connectivity():
    """SparseConvMap (SpatialConvolutionMap + nn.tables.random,
    /root/reference/opticalflow_model.lua:56-59): each output channel must
    depend ONLY on its table's nto input channels, and the parameter count
    must be the reference's sparse count (kh*kw*nto*nout + nout)."""
    import jax
    from depth_estimation_tpu.models.filters import (SparseConvMap,
                                                     random_connection_table)
    nin, nout, nto, kh, kw = 8, 5, 3, 3, 3
    m = SparseConvMap(nin=nin, nout=nout, nto=nto, kh=kh, kw=kw)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(10, 12, nin).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    k = params["params"]["kernel"]
    assert k.shape == (kh, kw, nto, nout)
    y0 = np.asarray(m.apply(params, x))
    assert y0.shape == (8, 10, nout)

    table = random_connection_table(nin, nout, nto)
    for o in range(nout):
        connected = set(int(c) for c in table[o])
        not_connected = [c for c in range(nin) if c not in connected]
        assert not_connected, "test needs nto < nin"
        x2 = np.asarray(x).copy()
        x2[..., not_connected] += rng.rand(10, 12, len(not_connected))
        y2 = np.asarray(m.apply(params, jnp.asarray(x2)))
        np.testing.assert_allclose(y2[..., o], y0[..., o], atol=1e-5)
        # and perturbing a connected channel DOES change the output
        x3 = np.asarray(x).copy()
        x3[..., int(table[o][0])] += 1.0
        y3 = np.asarray(m.apply(params, jnp.asarray(x3)))
        assert np.abs(y3[..., o] - y0[..., o]).max() > 1e-4


def test_conv_filter_builds_sparse_layer_on_chain_mismatch():
    """geometry.layers with cin != prev cout -> sparse layer with fan-in
    cin (the trainer's -s2c semantics, opticalflow.lua:156-161)."""
    import jax
    from depth_estimation_tpu.models.filters import ConvFilter
    g = Geometry(hImg=48, wImg=56, layers=((3, 5, 5, 8), (4, 5, 5, 6)),
                 maxh=4, maxw=4, maxhGT=4, maxwGT=4,
                 hKernelGT=9, wKernelGT=9)
    f = ConvFilter(g)
    x = jnp.zeros((20, 22, 3), jnp.float32)
    params = f.init(jax.random.PRNGKey(0), x)
    l2 = params["params"]["layer2"]
    assert l2["kernel"].shape == (5, 5, 4, 6)   # sparse fan-in 4 of 8
    y = f.apply(params, x)
    assert y.shape == (12, 14, 6)
    # gradient flows through the scatter
    loss = lambda p: jnp.sum(f.apply(p, x + 0.5) ** 2)
    grads = jax.grad(loss)(params)
    assert np.abs(np.asarray(grads["params"]["layer2"]["kernel"])).max() > 0
