"""Multiscale model invariants, ported from /root/reference/tests/test_multiscale.lua:
per-scale matching equals brute-force SSD argmin (:135-166), cascading equals
the hand-computed multi-scale mean (:169-193), middle-removal bands line up
with the yx2xMulti codec (:195-214), and end-to-end WTA decode consistency."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu import codecs
from depth_estimation_tpu.geometry import Geometry, Learning
from depth_estimation_tpu.models import flow as flow_model
from depth_estimation_tpu.models import multiscale as ms
from depth_estimation_tpu.models.filters import identity_filter_params


def make_geometry(ratios=(1, 2)):
    return Geometry(
        hImg=64, wImg=72,
        layers=((3, 8, 8, 8 * 8 * 3),),
        maxh=8, maxw=8, maxhGT=16, maxwGT=16, hKernelGT=16, wKernelGT=16,
        multiscale=True, ratios=ratios,
    )


def test_cascade_matches_hand_computed_mean():
    g = make_geometry((1, 2, 4))
    rng = np.random.RandomState(0)
    n = len(g.ratios)
    D = g.maxh * g.maxw
    dists = [jnp.asarray(rng.rand(3, D), jnp.float32) for _ in range(n)]
    out = ms.cascade(g, dists)
    cy, cx = math.ceil(g.maxh / 2), math.ceil(g.maxw / 2)
    douts = [np.asarray(d).reshape(3, g.maxh, g.maxw) for d in dists]
    for i in range(n):
        s = np.zeros((3, g.maxh, g.maxw), np.float32)
        for ii in range(-cy + 1, cy + 1):
            for jj in range(-cx + 1, cx + 1):
                for j in range(i, n):
                    r = g.ratios[j] // g.ratios[i]
                    s[:, ii + cy - 1, jj + cx - 1] += douts[j][
                        :, math.ceil(ii / r) + cy - 1, math.ceil(jj / r) + cx - 1]
        s /= (n - i)
        np.testing.assert_allclose(
            np.asarray(out[i]).reshape(3, g.maxh, g.maxw), s, rtol=1e-5)
    # coarsest passes through unchanged
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(dists[-1]))


@pytest.mark.parametrize("ratios", [(1, 2), (1, 2, 4)])
def test_band_concat_matches_codec(ratios):
    """Every concatenated index k must read the window cell that yx2xMulti
    assigns to k's displacement at k's scale."""
    g = make_geometry(ratios)
    bands = ms._band_indices(g)
    D = g.maxh * g.maxw
    cy, cx = math.ceil(g.maxh / 2), math.ceil(g.maxw / 2)
    for k in range(codecs.n_indices(g)):
        dy, dx = codecs.x2yx_multi_scalar(g, k)
        s = int(bands[k]) // D
        cell = int(bands[k]) % D
        r = g.ratios[s]
        ty = math.ceil(dy / r) + cy - 1
        tx = math.ceil(dx / r) + cx - 1
        assert cell == ty * g.maxw + tx, (k, dy, dx, s, cell)


@pytest.mark.slow
def test_full_image_recovers_shift():
    g = make_geometry((1, 2))
    model = ms.MultiscaleFlowModel(g)
    params = identity_filter_params(g)
    rng = np.random.RandomState(1)
    im2 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)
    dy_c, dx_c = 2, -3   # within the fine (scale 1) window
    im1 = np.roll(np.roll(im2, -dy_c, axis=0), -dx_c, axis=1)

    dist = model.forward_full(params, jnp.asarray(im1), jnp.asarray(im2))
    assert dist.shape == (g.hImg, g.wImg, codecs.n_indices(g))
    out = flow_model.process_output(g, dist, process_full=False)
    y = np.asarray(out.y)[20:-20, 20:-20]
    x = np.asarray(out.x)[20:-20, 20:-20]
    # Exactness up to coarse quantization: at half-cell coarse shifts a
    # confident coarse-band vote can beat the scale-averaged fine vote (an
    # inherent property of the reference's cascade+WTA — its own round-trip
    # test allows errors < the covering scale's ratio). Require ratio-2
    # tolerance everywhere and >= 95% exact.
    assert np.abs(y - dy_c).max() < 2 and np.abs(x - dx_c).max() < 2
    exact = ((y == dy_c) & (x == dx_c)).mean()
    assert exact > 0.95, exact


def test_full_image_coarse_shift():
    """A shift outside the fine window but inside the coarse one decodes to
    the right coarse cell (within ratio quantization)."""
    g = make_geometry((1, 2))
    model = ms.MultiscaleFlowModel(g)
    params = identity_filter_params(g)
    rng = np.random.RandomState(2)
    im2 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)
    dy_c, dx_c = 6, -5   # |d| >= maxh/2=4: only the r=2 scale can see it
    im1 = np.roll(np.roll(im2, -dy_c, axis=0), -dx_c, axis=1)
    dist = model.forward_full(params, jnp.asarray(im1), jnp.asarray(im2))
    out = flow_model.process_output(g, dist, process_full=False)
    b = 24
    y = np.asarray(out.y)[b:-b, b:-b]
    x = np.asarray(out.x)[b:-b, b:-b]
    # On white-noise images a spurious confident fine-scale match can beat a
    # split coarse vote at a few pixels (reference-faithful cascade+WTA
    # behavior), so require a strong majority within coarse quantization.
    ok = (np.abs(y - dy_c) < 2) & (np.abs(x - dx_c) < 2)
    assert ok.mean() > 0.9, (ok.mean(), np.unique(y), np.unique(x))


def test_fovea_matches_prepare_target():
    """Foveated training path: with identity features and a known shift, the
    log-distribution argmax equals prepareTarget's encoded index (the
    test_patches2.lua multiscale contract)."""
    g = make_geometry((1, 2))
    model = ms.MultiscaleFlowModel(g)
    params = identity_filter_params(g)
    lrn = Learning()
    rng = np.random.RandomState(3)
    im2 = rng.rand(g.hImg, g.wImg, 3).astype(np.float32)
    for dy_c, dx_c in [(1, 2), (-3, 4), (6, -6), (0, 0)]:
        im1 = np.roll(np.roll(im2, -dy_c, axis=0), -dx_c, axis=1)
        y, x = 32, 36
        logp = model.forward_fovea(
            params, jnp.asarray(im1), jnp.asarray(im2), y, x)
        assert logp.shape == (codecs.n_indices(g),)
        it, _ = flow_model.prepare_target(g, lrn, jnp.array([dy_c, dx_c]))
        pred = int(jnp.argmax(logp))
        py, px = codecs.x2yx_multi_scalar(g, pred)
        ty, tx = codecs.x2yx_multi_scalar(g, int(it))
        assert (py, px) == (ty, tx), ((dy_c, dx_c), (py, px), (ty, tx))


@pytest.mark.slow
def test_decode_full_matches_forward_full_argmax():
    """decode_full must equal the argmax (with middle tie-break) and max
    probability of the full multiscale distribution."""
    MultiscaleFlowModel = ms.MultiscaleFlowModel
    g = Geometry(hImg=64, wImg=80, layers=((3, 6, 6, 4),),
                 maxh=4, maxw=4, multiscale=True, ratios=(1, 2, 4))
    m = MultiscaleFlowModel(g)
    params = m.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(4)
    img1 = jnp.asarray(rng.rand(64, 80, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(64, 80, 3), jnp.float32)

    dist = np.asarray(m.forward_full(params, img1, img2))
    mid = codecs.middle_index(g)
    best = np.argmax(dist, axis=-1)
    bm = np.max(dist, axis=-1)
    tie = dist[..., mid] >= bm
    want_idx = np.where(tie, mid, best)
    want_pmax = np.where(tie, dist[..., mid], bm) / dist.sum(-1)

    idx, pmax = m.decode_full(params, img1, img2)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(pmax), want_pmax, rtol=1e-4,
                               atol=1e-6)


def test_cascade_beta_matches_hand_computed():
    """Trainable-beta cascade (the commented-out Mul2/Power design,
    /root/reference/CascadingAddTable.lua:24-63,93-98): recursive
    out[i] = (w1 in[i] + w2 gather(out[i+1])) ** (-1/sqrt(w1 w2))."""
    g = make_geometry((1, 2, 4))
    rng = np.random.RandomState(1)
    n = len(g.ratios)
    D = g.maxh * g.maxw
    dists = [jnp.asarray(rng.rand(3, D).astype(np.float32) + 0.1)
             for _ in range(n)]
    betas = jnp.asarray([[1.0, 4.0], [0.5, 2.0]], jnp.float32)
    out = ms.cascade_beta(g, dists, betas)

    def gather_np(d, r):
        M = ms._cascade_onehot(g.maxh, g.maxw, r)
        return np.asarray(d) @ M

    exp = [None] * n
    exp[n - 1] = np.asarray(dists[n - 1])
    for i in range(n - 2, -1, -1):
        w1, w2 = float(betas[i, 0]), float(betas[i, 1])
        r = g.ratios[i + 1] // g.ratios[i]
        s = w1 * np.asarray(dists[i]) + w2 * gather_np(exp[i + 1], r)
        exp[i] = np.power(s, -1.0 / math.sqrt(w1 * w2))
    for i in range(n):
        np.testing.assert_allclose(np.asarray(out[i]), exp[i],
                                   rtol=2e-5, atol=2e-5)


def test_cascade_beta_reference_init_is_reciprocal():
    """With the reference init (all weights -beta = -1, pow = -1) the link
    reduces to out0 = -1/(d0 + gather(d1))."""
    g = make_geometry((1, 2))
    rng = np.random.RandomState(2)
    D = g.maxh * g.maxw
    d0 = jnp.asarray(rng.rand(5, D).astype(np.float32) + 0.1)
    d1 = jnp.asarray(rng.rand(5, D).astype(np.float32) + 0.1)
    out = ms.cascade_beta(g, [d0, d1], ms.init_cascade_betas(g))
    M = ms._cascade_onehot(g.maxh, g.maxw, 2)
    exp = -1.0 / (np.asarray(d0) + np.asarray(d1) @ M)
    np.testing.assert_allclose(np.asarray(out[0]), exp, rtol=2e-5)


@pytest.mark.parametrize("single_beta", [False, True])
@pytest.mark.slow
def test_trainable_beta_model_gradients(single_beta):
    """-mstw/-mssb end-to-end: init grows a cascade collection, the fovea
    forward consumes it, and gradients reach the betas."""
    import dataclasses
    g = dataclasses.replace(make_geometry((1, 2)),
                            cascad_trainable_weights=True,
                            single_beta=single_beta)
    model = ms.MultiscaleFlowModel(g)
    params = model.init(jax.random.PRNGKey(0))
    assert "cascade" in params
    expect_shape = (1,) if single_beta else (1, 2)
    assert params["cascade"]["betas"].shape == expect_shape
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3).astype(np.float32))
    yc = g.hImg // 2
    xc = g.wImg // 2

    def loss(p):
        out = model.forward_fovea(p, img1, img2, yc, xc, log=False)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    gb = np.asarray(grads["cascade"]["betas"])
    assert np.isfinite(gb).all() and (np.abs(gb) > 0).any(), gb
    # filter still gets gradients too
    gleaf = jax.tree.leaves(grads["params"])
    assert any(np.abs(np.asarray(x)).max() > 0 for x in gleaf)
    # decode fallback path runs and agrees with forward_full argmax/max
    idx, pmax = model.decode_full(params, img1, img2)
    full = model.forward_full(params, img1, img2, log=False)
    vmax = np.asarray(jnp.max(full, axis=-1))
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(full), np.asarray(idx)[..., None],
                           -1)[..., 0], vmax, rtol=1e-5)


@pytest.mark.parametrize("ratios", [(1, 2), (1, 2, 4)])
def test_cascade_gradient_check(ratios):
    """Jacobian check of the cascade — the reference gradient-checks
    CascadingAddTable with nn.Jacobian over randomized shapes/ratios
    (/root/reference/tests/test_cascad.lua:3-38, tol 1e-5)."""
    from jax.test_util import check_grads
    g = make_geometry(ratios)
    rng = np.random.RandomState(11)
    n = len(g.ratios)
    D = g.maxh * g.maxw
    from jax import enable_x64

    def f(*ds):
        return sum(jnp.sum(o ** 2) for o in ms.cascade(g, list(ds)))

    with enable_x64():   # f32 finite differences are too noisy here
        dists = [jnp.asarray(rng.rand(2, D) + 0.1) for _ in range(n)]
        check_grads(f, tuple(dists), order=1, modes=("fwd", "rev"),
                    atol=1e-4, rtol=1e-4)


def test_cascade_beta_gradient_check():
    """Gradient check of the trainable-beta cascade w.r.t. both the inputs
    and the beta weights (positive weights keep the Power branch smooth)."""
    from jax.test_util import check_grads
    g = make_geometry((1, 2))
    rng = np.random.RandomState(12)
    D = g.maxh * g.maxw
    from jax import enable_x64

    with enable_x64():
        d0 = jnp.asarray(rng.rand(2, D) + 0.2)
        d1 = jnp.asarray(rng.rand(2, D) + 0.2)
        betas = jnp.asarray([[1.5, 0.7]], jnp.float64)

        def f_inputs(d0, d1):
            return sum(jnp.sum(o ** 2)
                       for o in ms.cascade_beta(g, [d0, d1], betas))

        check_grads(f_inputs, (d0, d1), order=1, modes=("rev",),
                    atol=1e-4, rtol=1e-4)

        # Beta gradients deliberately treat the Power normalizer as a
        # CONSTANT (stop_gradient) — the reference updates it only after
        # each SGD step (updateNormalizers, CascadingAddTable.lua:93-105).
        # So validate jax.grad against finite differences of the math with
        # the pow FROZEN at its unperturbed value.
        M = jnp.asarray(ms._cascade_onehot(g.maxh, g.maxw, 2),
                        jnp.float64)
        pw0 = -1.0 / np.sqrt(float(betas[0, 0] * betas[0, 1]))

        def f_frozen(b):
            s = b[0, 0] * d0 + b[0, 1] * (d1 @ M)
            return jnp.sum(jnp.power(s, pw0) ** 2) + jnp.sum(d1 ** 2)

        def f_full(b):
            return sum(jnp.sum(o ** 2)
                       for o in ms.cascade_beta(g, [d0, d1], b))

        gb = np.asarray(jax.grad(f_full)(betas))
        eps = 1e-6
        for i in range(2):
            bp = betas.at[0, i].add(eps)
            bm = betas.at[0, i].add(-eps)
            fd = (float(f_frozen(bp)) - float(f_frozen(bm))) / (2 * eps)
            np.testing.assert_allclose(gb[0, i], fd, rtol=1e-4)


def test_forward_fovea_batch_matches_per_sample():
    """The static-crop batched fovea forward must equal the per-sample
    dynamic-slice forward on the same foveas (it reads the same pixels)."""
    import math
    g = make_geometry((1, 2))
    model = ms.MultiscaleFlowModel(g)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(7)
    im1 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3).astype(np.float32))
    Hm, Wm = g.rmax * g.hPatch2, g.rmax * g.wPatch2
    y_lo = math.ceil(Hm / 2) - 1
    x_lo = math.ceil(Wm / 2) - 1
    foveas = [(y_lo, x_lo), (32, 36), (g.hImg - (Hm - y_lo) - 1,
                                       g.wImg - (Wm - x_lo) - 1)]
    crops1 = jnp.stack([im1[y - y_lo:y - y_lo + Hm, x - x_lo:x - x_lo + Wm]
                        for y, x in foveas])
    crops2 = jnp.stack([im2[y - y_lo:y - y_lo + Hm, x - x_lo:x - x_lo + Wm]
                        for y, x in foveas])
    batched = np.asarray(model.forward_fovea_batch(params, crops1, crops2))
    for i, (y, x) in enumerate(foveas):
        single = np.asarray(model.forward_fovea(params, im1, im2, y, x))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_unshared_filters_branch():
    """share_filters=False trains an INDEPENDENT filter per pyramid scale
    (the reference clones the trunk instead of weight-sharing it,
    /root/reference/opticalflow_model_multiscale.lua:219-225): per-scale
    param trees, exact equivalence to the shared model when every scale
    carries identical weights, independent gradients under training, and a
    checkpoint round trip through the sf=0-tagged directory name."""
    import dataclasses
    import os
    import tempfile

    from depth_estimation_tpu.models import io as model_io
    from depth_estimation_tpu.training import train as training

    g = dataclasses.replace(make_geometry((1, 2)), share_filters=False)
    model = ms.MultiscaleFlowModel(g)
    params = model.init(jax.random.PRNGKey(0))
    assert set(params["scales"]) == {"scale0", "scale1"}
    l0 = jax.tree.leaves(params["scales"]["scale0"])
    l1 = jax.tree.leaves(params["scales"]["scale1"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(l0, l1)), "per-scale inits must differ"

    # identical per-scale weights == the shared model, bitwise
    gs = make_geometry((1, 2))
    shared = ms.MultiscaleFlowModel(gs)
    p0 = shared.init(jax.random.PRNGKey(1))
    tied = {"scales": {"scale0": p0, "scale1": p0}}
    rng = np.random.RandomState(2)
    im1 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3).astype(np.float32))
    im2 = jnp.asarray(np.roll(np.asarray(im1), 2, axis=1))
    np.testing.assert_array_equal(
        np.asarray(model.forward_full(tied, im1, im2)),
        np.asarray(shared.forward_full(p0, im1, im2)))
    idx_u, _ = model.decode_full(tied, im1, im2)
    idx_s, _ = shared.decode_full(p0, im1, im2)
    np.testing.assert_array_equal(np.asarray(idx_u), np.asarray(idx_s))

    # one training step must move BOTH scales, independently
    lrn = Learning(rate=0.05, batch_size=4, criterion="nll")
    tr = training.MultiscaleTrainer(model, lrn)
    state = tr.init(jax.random.PRNGKey(3))
    Hm, Wm = g.rmax * g.hPatch2, g.rmax * g.wPatch2
    c1 = jnp.asarray(rng.rand(4, Hm, Wm, 3), jnp.float32)
    c2 = jnp.asarray(rng.rand(4, Hm, Wm, 3), jnp.float32)
    it = jnp.asarray(rng.randint(0, codecs.n_indices(g), 4), jnp.int32)
    soft_t = jnp.zeros((4, codecs.n_indices(g)), jnp.float32)
    new_state, aux = tr._step(state, c1, c2, it, soft_t)
    assert bool(aux["grad_ok"])
    for sk in ("scale0", "scale1"):
        moved = max(np.abs(np.asarray(a) - np.asarray(b)).max()
                    for a, b in zip(
                        jax.tree.leaves(state.params["scales"][sk]),
                        jax.tree.leaves(new_state.params["scales"][sk])))
        assert moved > 0, f"{sk} did not train"
    # the two scales' updates differ (independent gradients)
    deltas = [np.asarray(a) - np.asarray(b) for a, b in zip(
        jax.tree.leaves(new_state.params["scales"]["scale0"]),
        jax.tree.leaves(new_state.params["scales"]["scale1"]))]
    base = [np.asarray(a) - np.asarray(b) for a, b in zip(
        jax.tree.leaves(state.params["scales"]["scale0"]),
        jax.tree.leaves(state.params["scales"]["scale1"]))]
    assert any(np.abs(d - b).max() > 1e-8 for d, b in zip(deltas, base))

    # checkpoint round trip; the dir name records the unshared trunk
    name = model_io.model_dir_name(g, lrn)
    assert "sf=0" in name
    with tempfile.TemporaryDirectory() as td:
        p = model_io.save_model(os.path.join(td, name), g, lrn,
                                new_state.params)
        g2, _, params2, _ = model_io.load_model(p)
        assert not g2.share_filters
        for a, b in zip(jax.tree.leaves(params2),
                        jax.tree.leaves(new_state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_unshared_meta_with_shared_params_migrates():
    """Checkpoints written before the unshared-filters branch existed carry
    share_filters=False in meta.json (the CLI default without -sf) but a
    SHARED params tree — the model always trained shared weights then.
    load_model must restore them as the shared model they are (corrected
    geometry), not raise a template mismatch."""
    import dataclasses
    import os
    import tempfile

    from depth_estimation_tpu.models import io as model_io

    g_unshared = dataclasses.replace(make_geometry((1, 2)),
                                     share_filters=False)
    g_shared = dataclasses.replace(g_unshared, share_filters=True)
    shared_params = ms.MultiscaleFlowModel(g_shared).init(
        jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as td:
        # what the pre-branch code persisted: unshared meta, shared payload
        p = model_io.save_model(os.path.join(td, "legacy"), g_unshared,
                                Learning(), shared_params)
        g2, _, params2, _ = model_io.load_model(p)
        assert g2.share_filters, "migration must correct the geometry"
        assert "scales" not in params2
        for a, b in zip(jax.tree.leaves(params2),
                        jax.tree.leaves(shared_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unshared_checkpoint_bad_payload_surfaces_real_error():
    """Structural migration detection (round-3 advisor finding): a
    genuinely-UNSHARED checkpoint whose payload is corrupt must raise the
    real unpack error, not be silently retried against the shared template
    (which used to produce a misleading secondary mismatch error)."""
    import dataclasses
    import os
    import tempfile

    import pytest

    from depth_estimation_tpu.models import io as model_io

    g_unshared = dataclasses.replace(make_geometry((1, 2)),
                                     share_filters=False)
    params = ms.MultiscaleFlowModel(g_unshared).init(jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as td:
        p = model_io.save_model(os.path.join(td, "m"), g_unshared,
                                Learning(), params)
        blob_path = os.path.join(p, "params.msgpack")
        with open(blob_path, "rb") as f:
            blob = f.read()
        with open(blob_path, "wb") as f:
            f.write(blob[: len(blob) // 2])  # truncate
        with pytest.raises(Exception) as ei:
            model_io.load_model(p)
        # the shared-template retry would raise a flax value/key mismatch
        # mentioning the template; the real error is a msgpack unpack one
        assert "msgpack" in type(ei.value).__module__ or \
            "unpack" in str(ei.value).lower() or \
            "Unpack" in type(ei.value).__name__
