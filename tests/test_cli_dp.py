"""--dp CLI surface: the user-reachable path into the §2.5 mesh parallelism.

Round-4 verdict: `parallel/mesh.py` covered training/inference/GT builds but
no CLI could engage a mesh — a user on real multi-chip hardware got one
device. These tests run the actual CLIs with --dp on the 8-device virtual
CPU mesh (conftest) at tiny shapes, and pin that the sharded dataset build
matches the unsharded one per pair.
"""

import json
import os

import numpy as np
import pytest

from tests.test_datasets import make_sequence
from tests.test_cli import register_test_calibrations  # noqa: F401 (fixture)


def test_auto_mesh_resolution():
    import jax
    from depth_estimation_tpu.parallel import mesh as pm
    assert pm.auto_mesh("off") is None
    assert pm.auto_mesh("0") is None
    assert pm.auto_mesh("1") is None
    m = pm.auto_mesh("auto")
    assert m is not None and m.devices.size == len(jax.devices())
    m4 = pm.auto_mesh("4")
    assert m4.devices.size == 4
    with pytest.raises(SystemExit):
        pm.auto_mesh("999")


def test_sharded_dataset_build_matches_unsharded(tmp_path):
    """load_data_optical_flow with a mesh: rectification + GT sharded over
    8 devices must reproduce the single-device build. Tolerances: XLA
    compiles the per-pair program differently inside shard_map (local
    batch shape + partitioned context), which drifts the LK tracks by
    ulps; on knife-edge pairs the RANSAC inlier gate can amplify that
    into a visibly different (still valid) rotation fit, so the pin is
    majority-of-pairs tight agreement + bounded mean drift everywhere +
    run-to-run determinism of the sharded build itself."""
    from depth_estimation_tpu.data import datasets as ds_mod
    from depth_estimation_tpu.geometry import Geometry
    from depth_estimation_tpu.geometry3d import calibration as calmod
    from depth_estimation_tpu.parallel import mesh as pm

    root = make_sequence(tmp_path, n=4, h=64, w=80, dx=2)
    cal = calmod.PRESETS["test64x80"]
    g = Geometry(hImg=64, wImg=80, layers=((3, 5, 5, 8),), maxh=6, maxw=6,
                 maxhGT=6, maxwGT=6, hKernelGT=5, wKernelGT=5)
    base = ds_mod.load_data_optical_flow(g, cal, root, 4, cache_root=None)
    mesh = pm.make_mesh()
    sharded = ds_mod.load_data_optical_flow(g, cal, root, 4, cache_root=None,
                                            mesh=mesh)
    assert len(base["flow"]) == len(sharded["flow"]) == 3
    tight = 0
    for a, b in zip(base["warped_images"], sharded["warped_images"]):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert float(d.mean()) < 0.02          # same rectification, roughly
        tight += float(d.max()) < 1e-3
    assert tight >= 2, tight                   # most pairs match to ulps
    for a, b in zip(base["flow"], sharded["flow"]):
        assert (a is None) == (b is None)
        if a is not None:
            assert float(np.mean(a == b)) > 0.9
    # the sharded build is deterministic
    again = ds_mod.load_data_optical_flow(g, cal, root, 4, cache_root=None,
                                          mesh=mesh)
    for a, b in zip(sharded["warped_images"], again["warped_images"]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_opticalflow_cli_dp_end_to_end(tmp_path):
    """The trainer CLI with --dp auto on the 8-device mesh: dataset build
    sharded, training step re-jitted with dp shardings, checkpoint written."""
    root = make_sequence(tmp_path, n=4, h=64, w=80, dx=2)
    out = str(tmp_path / "models")
    from depth_estimation_tpu.cli import opticalflow
    rc = opticalflow.main([
        "--root-directory", root,
        "--num-input-images", "4",
        "--n-train-set", "48", "--n-test-set", "16",
        "--num-epochs", "1",
        "--n-features", "8",
        "--kernel1-size", "5",
        "--num-layers", "1",
        "--window-size", "6",
        "--gt-window-size", "6",
        "--learning-rate", "0.05",
        "--batch-size", "16",
        "--calibration", "test64x80",
        "--output-model-dir", out,
        "--dp", "auto",
    ])
    assert rc == 0
    dirs = os.listdir(out)
    assert len(dirs) == 1
    meta = json.load(open(os.path.join(out, dirs[0], "meta.json")))
    assert len(meta["score"]) == 1


@pytest.mark.slow
def test_opticalflow_cli_dp_matches_single_device(tmp_path):
    """One dp epoch == one single-device epoch on the same data, to the
    reduction-order tolerance of the gradient all-reduce. Pins that --dp
    changes throughput, not the trained model."""
    root = make_sequence(tmp_path, n=4, h=64, w=80, dx=2)
    from depth_estimation_tpu.cli import opticalflow
    common = [
        "--root-directory", root,
        "--num-input-images", "4",
        "--n-train-set", "32", "--n-test-set", "16",
        "--num-epochs", "1",
        "--n-features", "8",
        "--kernel1-size", "5",
        "--num-layers", "1",
        "--window-size", "6",
        "--gt-window-size", "6",
        "--learning-rate", "0.05",
        "--batch-size", "16",
        "--calibration", "test64x80",
    ]
    out1 = str(tmp_path / "m1")
    out2 = str(tmp_path / "m2")
    assert opticalflow.main(common + ["--output-model-dir", out1,
                                      "--dp", "off"]) == 0
    assert opticalflow.main(common + ["--output-model-dir", out2,
                                      "--dp", "auto"]) == 0
    (d1,) = os.listdir(out1)
    (d2,) = os.listdir(out2)
    m1 = json.load(open(os.path.join(out1, d1, "meta.json")))
    m2 = json.load(open(os.path.join(out2, d2, "meta.json")))
    assert abs(m1["score"][0]["loss"] - m2["score"][0]["loss"]) < 1e-4


def test_rectify_cli_dp(tmp_path):
    """tools rectify --dp: sharded batch path writes the same files the
    per-pair path does."""
    root = make_sequence(tmp_path, n=4, h=64, w=80, dx=2)
    from depth_estimation_tpu.cli import tools
    rc = tools.main(["rectify", root, "--calibration", "test64x80",
                     "--dp", "auto"])
    assert rc == 0
    und = sorted(os.listdir(os.path.join(root, "undistorted_images")))
    rect = sorted(os.listdir(os.path.join(root, "rectified_images")))
    assert len(und) == 3 and len(rect) == 3

    # the per-pair path on a fresh copy produces identical images
    root2 = make_sequence(tmp_path / "b", n=4, h=64, w=80, dx=2)
    rc = tools.main(["rectify", root2, "--calibration", "test64x80",
                     "--dp", "off"])
    assert rc == 0
    # tolerance: the batched program drifts by ulps vs the per-pair one
    # (max +-1 after uint8 quantization); on a knife-edge pair the RANSAC
    # rotation fit may differ visibly (still a valid fit — see
    # test_sharded_dataset_build_matches_unsharded), so at most one
    # rectified pair may exceed the quantization band
    from PIL import Image
    for f in und:
        a = np.asarray(Image.open(os.path.join(root, "undistorted_images", f)))
        b = np.asarray(Image.open(os.path.join(root2, "undistorted_images", f)))
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 1
    loose = 0
    for f in rect:
        a = np.asarray(Image.open(os.path.join(root, "rectified_images", f)))
        b = np.asarray(Image.open(os.path.join(root2, "rectified_images", f)))
        d = np.abs(a.astype(int) - b.astype(int))
        loose += int(d.max()) > 1
        assert float((d > 2).mean()) < 0.05
    assert loose <= 1, loose


@pytest.mark.slow
def test_radial_cli_dp_end_to_end(tmp_path):
    """train_radial --dp auto: polar dataset build + training sharded.
    Scene construction mirrors tests/test_cli.py's radial fixture (two
    depth planes, forward motion) so the essential fit is non-degenerate."""
    import jax.numpy as jnp
    from depth_estimation_tpu.flow.celiu import bilinear_sample, gaussian_smooth
    from PIL import Image
    rng = np.random.RandomState(0)
    H, W = 128, 160
    base = np.asarray(gaussian_smooth(
        jnp.asarray(rng.rand(H, W, 3).astype(np.float32)), 0.8, 2))
    base = np.clip(base * 1.5, 0, 1).astype(np.float32)

    def forward_step(img, s_top, s_bottom):
        cy, cx = H / 2, W / 2
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        s = np.where(yy < cy, s_top, s_bottom)
        xs = cx + (xx - cx) / s
        ys = cy + (yy - cy) / s
        return np.asarray(bilinear_sample(jnp.asarray(img),
                                          jnp.asarray(xs), jnp.asarray(ys)))

    d = tmp_path / "seq" / "images"
    os.makedirs(d)
    frame = base
    for i in range(3):
        Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8)).save(
            d / f"{i:09d}.png")
        frame = forward_step(frame, 1.05, 1.10)

    from depth_estimation_tpu.cli import train_radial
    rc = train_radial.main([
        "-rd", str(tmp_path / "seq"),
        "-cal", "test128x160",
        "-net", "[[3,5,5,8]]",
        "-hwin", "5", "-hi", "100", "-wi", "100",
        "-ni", "3", "-n", "64", "-e", "1", "-bs", "16",
        "-omd", str(tmp_path / "mr"),
        "--dp", "auto",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "mr" / "e0.msgpack")
