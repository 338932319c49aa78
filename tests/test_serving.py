"""Serving exports (serving.py): the StableHLO artifact must reproduce the
live program bitwise, embed the weights (no params at call time), and round
trip through the `tools export` CLI."""

import numpy as np
import jax
import jax.numpy as jnp

from depth_estimation_tpu import serving
from depth_estimation_tpu.geometry import Geometry, Learning
from depth_estimation_tpu.models.flow import FlowModel


def _tiny():
    g = Geometry(hImg=32, wImg=40, layers=((3, 5, 5, 6),), maxh=4, maxw=4)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(0))
    return g, model, params


def test_flow_forward_roundtrip(tmp_path):
    g, model, params = _tiny()
    path = str(tmp_path / "fwd.stablehlo")
    serving.export_flow_forward(g, params, path)
    re = serving.load_exported(path)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3), jnp.float32)
    got = re.call(img1, img2)                    # no params: weights embedded
    want = jax.jit(model.forward_fused)(params, img1, img2)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_pairs_roundtrip(tmp_path):
    import dataclasses
    from depth_estimation_tpu import api_batched as apib
    from depth_estimation_tpu.geometry3d import calibration as calmod

    hp, wp = 48, 64
    cal = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="srv", wImg=wp, hImg=hp,
        fx=60.0, fy=60.0, cx=wp / 2, cy=hp / 2,
        sfm=dataclasses.replace(calmod.RECTIFIED_GOPRO_SMALL.sfm,
                                max_points=64))
    g = Geometry(hImg=hp, wImg=wp, layers=((3, 5, 5, 6),), maxh=4, maxw=4)
    params = FlowModel(g).init(jax.random.PRNGKey(1))

    path = str(tmp_path / "pipe.stablehlo")
    serving.export_pipeline_pairs(g, params, cal, batch=2,
                                  frame_hw=(hp, wp), path=path)
    re = serving.load_exported(path)

    rng = np.random.RandomState(2)
    base = rng.rand(2, hp // 4, wp // 4, 3).astype(np.float32)
    f1 = np.asarray(jax.image.resize(jnp.asarray(base), (2, hp, wp, 3),
                                     "bilinear"))
    f2 = np.roll(f1, -1, axis=2)
    u1 = jnp.asarray((f1 * 255).astype(np.uint8))
    u2 = jnp.asarray((f2 * 255).astype(np.uint8))

    got = re.call(u1, u2)
    pipeline = apib.make_batched_pipeline(g, cal)
    want = pipeline(params, u1, u2)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_export(tmp_path):
    from depth_estimation_tpu.models import io as mio
    from depth_estimation_tpu.cli import tools

    g, model, params = _tiny()
    mdir = mio.save_model(str(tmp_path), g,
                          Learning(rate=1e-2, batch_size=4, criterion="nll"),
                          params)
    out = str(tmp_path / "artifact.stablehlo")
    assert tools.main(["export", mdir, "--out", out]) == 0

    re = serving.load_exported(out)
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3), jnp.float32)
    got = re.call(img1, img2)
    want = jax.jit(model.forward_fused)(params, img1, img2)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multiscale_export_roundtrip(tmp_path):
    from depth_estimation_tpu.models.multiscale import MultiscaleFlowModel

    g = Geometry(hImg=24, wImg=32, layers=((3, 5, 5, 6),), maxh=4, maxw=4,
                 multiscale=True, ratios=(1, 2))
    model = MultiscaleFlowModel(g)
    params = model.init(jax.random.PRNGKey(4))

    path = str(tmp_path / "ms.stablehlo")
    serving.export_flow_forward(g, params, path)
    re = serving.load_exported(path)

    rng = np.random.RandomState(5)
    img1 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(g.hImg, g.wImg, 3), jnp.float32)
    got = re.call(img1, img2)
    want = jax.jit(model.decode_full)(params, img1, img2)
    for a, b in zip(got, want):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b)
        else:
            # embedding the weights as constants changes XLA fusion order
            # slightly (measured 1.5e-8 max) — physical equality, not bitwise
            np.testing.assert_allclose(a, b, atol=1e-6)
