"""CLI end-to-end tests: the main trainer on a tiny synthetic dataset,
the radial trainer, score_epoch/learning curves, and the microbenchmark."""

import json
import os
import re

import numpy as np
import pytest

from tests.test_datasets import make_sequence


@pytest.mark.slow
def test_opticalflow_cli_end_to_end(tmp_path):
    root = make_sequence(tmp_path, n=4, h=64, w=80, dx=2)
    out = str(tmp_path / "models")
    from depth_estimation_tpu.cli import opticalflow
    rc = opticalflow.main([
        "--root-directory", root,
        "--num-input-images", "4",
        "--n-train-set", "48", "--n-test-set", "16",
        "--num-epochs", "2",
        "--n-features", "8",
        "--kernel1-size", "5",
        "--num-layers", "1",
        "--window-size", "6",
        "--gt-window-size", "6",
        "--learning-rate", "0.05",
        "--batch-size", "16",
        "--calibration", "test64x80",
        "--output-model-dir", out,
    ])
    assert rc == 0
    dirs = os.listdir(out)
    assert len(dirs) == 1
    meta = json.load(open(os.path.join(out, dirs[0], "meta.json")))
    assert meta["version"] == 9
    assert len(meta["score"]) == 2
    assert meta["score"][0]["test_acc"] >= 0.0
    # curves plotting
    from depth_estimation_tpu.training.curves import plot_learning_curves
    png = plot_learning_curves(out, str(tmp_path / "curve.png"))
    assert png and os.path.exists(png)


def test_opticalflow_cli_resume_continues_run(tmp_path):
    """--resume: rerunning with the same flags and a higher --num-epochs
    must pick up the checkpoint (same model dir), keep the recorded score
    history, and train only the remaining epochs — weight-faithful
    continuation like the reference's -lw (opticalflow.lua:51,231-232),
    plus history so the epoch axis stays truthful."""
    root = make_sequence(tmp_path, n=4, h=64, w=80, dx=2)
    out = str(tmp_path / "models")
    from depth_estimation_tpu.cli import opticalflow
    common = [
        "--root-directory", root,
        "--num-input-images", "4",
        "--n-train-set", "48", "--n-test-set", "16",
        "--n-features", "8",
        "--kernel1-size", "5",
        "--num-layers", "1",
        "--window-size", "6",
        "--gt-window-size", "6",
        "--learning-rate", "0.05",
        "--batch-size", "16",
        "--calibration", "test64x80",
        "--output-model-dir", out,
    ]
    assert opticalflow.main(common + ["--num-epochs", "2"]) == 0
    (d,) = os.listdir(out)
    first = json.load(open(os.path.join(out, d, "meta.json")))
    assert len(first["score"]) == 2

    assert opticalflow.main(common + ["--num-epochs", "4", "--resume"]) == 0
    assert os.listdir(out) == [d]          # same deterministic dir name
    meta = json.load(open(os.path.join(out, d, "meta.json")))
    assert len(meta["score"]) == 4
    # the first two epochs are the original run's, untouched
    assert meta["score"][:2] == first["score"]
    assert [s["epoch"] for s in meta["score"]] == [0, 1, 2, 3]
    # without --resume the same rerun would retrain from scratch epoch 0
    # (pinned so --resume stays opt-in)
    assert opticalflow.main(common + ["--num-epochs", "2"]) == 0
    meta2 = json.load(open(os.path.join(out, d, "meta.json")))
    assert len(meta2["score"]) == 2


@pytest.mark.slow
def test_radial_cli_end_to_end(tmp_path):
    """Forward-motion sequence over a two-depth scene (top plane far, bottom
    plane near) so the essential-matrix fit is non-degenerate and flow is
    radially outward from the center epipole."""
    import jax.numpy as jnp
    from depth_estimation_tpu.flow.celiu import bilinear_sample, gaussian_smooth
    from PIL import Image
    rng = np.random.RandomState(0)
    H, W = 128, 160
    # strong texture at working resolution: mildly smoothed noise keeps the
    # patch-SSD minima sharp (GT confidence) while LK still tracks
    base = np.asarray(gaussian_smooth(
        jnp.asarray(rng.rand(H, W, 3).astype(np.float32)), 0.8, 2))
    base = np.clip(base * 1.5, 0, 1).astype(np.float32)

    def forward_step(img, s_top, s_bottom):
        """Next frame after forward motion: zoom factor s per depth plane."""
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
        # two DISTINCT depth planes (a single uniform zoom = planar scene
        # = degenerate essential geometry), both zooming hard enough that
        # the radial flow dominates tracking noise — with the fixture's
        # strict corner gate the epipole stays near the principal point
        # and the polar warp's valid disc covers the frame
        frame = forward_step(frame, 1.05, 1.10)

    from depth_estimation_tpu.cli import train_radial
    rc = train_radial.main([
        "-rd", str(tmp_path / "seq"),
        "-cal", "test128x160",
        "-net", "[[3,5,5,8]]",
        "-hwin", "5", "-hi", "100", "-wi", "100",
        "-ni", "3", "-n", "64", "-e", "1", "-bs", "16",
        "-omd", str(tmp_path / "mr"),
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "mr" / "e0.msgpack")


@pytest.mark.slow
def test_radial_cli_scene_length_drops_seam_pairs(tmp_path, capsys):
    """--scene-length deterministically drops pairs that straddle scene
    boundaries in a multi-scene dataset dir. The ego-motion inlier gate is
    NOT a seam detector (measured on the dossier's noisy corpus: all five
    unrelated-texture seam pairs passed it), hence the explicit flag."""
    import jax.numpy as jnp
    from depth_estimation_tpu.flow.celiu import bilinear_sample, gaussian_smooth
    from PIL import Image
    H, W = 128, 160

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
    rng = np.random.RandomState(0)
    for s in range(2):                      # two unrelated 3-frame scenes
        frame = np.clip(np.asarray(gaussian_smooth(
            jnp.asarray(rng.rand(H, W, 3).astype(np.float32)), 0.8, 2))
            * 1.5, 0, 1).astype(np.float32)
        for i in range(3):
            Image.fromarray((np.clip(frame, 0, 1) * 255).astype(
                np.uint8)).save(d / f"{s * 3 + i:09d}.png")
            frame = forward_step(frame, 1.05, 1.10)

    from depth_estimation_tpu.cli import train_radial

    def usable(extra, omd):
        rc = train_radial.main([
            "-rd", str(tmp_path / "seq"), "-cal", "test128x160",
            "-net", "[[3,5,5,8]]", "-hwin", "5", "-hi", "100", "-wi", "100",
            "-ni", "6", "-n", "64", "-e", "1", "-bs", "16",
            "-omd", str(tmp_path / omd),
        ] + extra)
        assert rc == 0
        out = capsys.readouterr().out
        m = re.search(r"(\d+)/5 pairs usable", out)
        assert m, out
        return int(m.group(1))

    # 5 consecutive pairs; pair (frame2, frame3) straddles the seam and
    # must be dropped regardless of what the inlier gate thinks of it.
    # Compare against the SAME loader without -sl: the flag itself must be
    # what drops the seam pair (a <=4 assertion alone would also pass if
    # -sl were ignored and the gate happened to drop the seam pair —
    # round-3 advisor finding).
    with_sl = usable(["-sl", "3"], "mr")
    without_sl = usable([], "mr_nosl")
    assert with_sl <= 4
    assert without_sl > with_sl, (without_sl, with_sl)


@pytest.fixture(autouse=True)
def register_test_calibrations():
    import dataclasses
    from depth_estimation_tpu.geometry3d import calibration as calmod
    # stricter corner-quality gate than the gopro presets (0.001 vs
    # 0.0001): on small smoothed-noise textures the weak corners the loose
    # gate admits track badly and tilt the estimated translation — the
    # epipole wanders off-center and the polar warp's valid disc collapses
    sfm = dataclasses.replace(calmod.RECTIFIED_GOPRO_SMALL.sfm,
                              max_points=400, points_quality=0.001)
    calmod.PRESETS["test64x80"] = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="test64x80", wImg=80, hImg=64,
        fx=120.0, fy=120.0, cx=40.0, cy=32.0, sfm=sfm)
    calmod.PRESETS["test128x160"] = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="test128x160", wImg=160, hImg=128,
        fx=200.0, fy=200.0, cx=80.0, cy=64.0, sfm=sfm)
    calmod.PRESETS["test64x64"] = dataclasses.replace(
        calmod.RECTIFIED_GOPRO_SMALL, name="test64x64", wImg=64, hImg=64,
        fx=100.0, fy=100.0, cx=32.0, cy=32.0, sfm=sfm)
    yield
    calmod.PRESETS.pop("test64x80", None)
    calmod.PRESETS.pop("test128x160", None)
    calmod.PRESETS.pop("test64x64", None)


@pytest.mark.slow
def test_time_matching_tool(capsys):
    from depth_estimation_tpu.cli import tools
    rc = tools.main(["time-matching", "--iters", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "filter" in out and "fps" in out


@pytest.mark.slow
def test_v2_cli_end_to_end(tmp_path):
    root = make_sequence(tmp_path, n=3, h=64, w=80, dx=2)
    from depth_estimation_tpu.cli import train_v2
    rc = train_v2.main([
        "-rd", root, "-cal", "test64x80",
        "-win", "5", "-ker", "5", "-nf", "8", "-nk", "5",
        "-n", "32", "-e", "1", "-bs", "16",
        "-omd", str(tmp_path / "mv2"),
    ])
    assert rc == 0
    import os
    assert os.path.exists(tmp_path / "mv2" / "e0")


@pytest.mark.slow
def test_video_pipeline_end_to_end(tmp_path):
    """Full offline video pipeline (test_opticalflow.lua stage list) on a
    small synthetic sequence: panels with all three rows written, no op in
    ops/extract left uncalled."""
    from PIL import Image
    import jax

    from depth_estimation_tpu.geometry import Geometry, Learning
    from depth_estimation_tpu.models.flow import FlowModel
    from depth_estimation_tpu.models import io as model_io
    from depth_estimation_tpu.cli import tools

    root = make_sequence(tmp_path, n=4, h=64, w=80, dx=2)
    g = Geometry(hImg=64, wImg=80, layers=((3, 5, 5, 8),), maxh=6, maxw=6)
    m = FlowModel(g)
    params = m.init(jax.random.PRNGKey(0))
    mdir = str(tmp_path / "model")
    model_io.save_model(mdir, g, Learning(), params)

    out = str(tmp_path / "video_out")
    rc = tools.main(["video", mdir, root,
                     "--calibration", "test64x80",
                     "--output-dir", out, "--num", "3"])
    assert rc == 0
    pngs = sorted(f for f in os.listdir(out) if f.endswith(".png"))
    assert len(pngs) == 3
    panel = np.asarray(Image.open(os.path.join(out, pngs[0])))
    # 3 rows x 3 cols of 64x80 panels
    assert panel.shape[0] == 3 * 64 and panel.shape[1] == 3 * 80

    # opt-in entropy gate: a near-zero threshold masks essentially every
    # pixel, so the depth-panel confidence goes dark vs the ungated run
    out2 = str(tmp_path / "video_out_gated")
    rc = tools.main(["video", mdir, root,
                     "--calibration", "test64x80",
                     "--output-dir", out2, "--num", "1",
                     "--entropy-thr", "1e-4"])
    assert rc == 0
    assert os.path.exists(os.path.join(out2, "000000000.png"))


@pytest.mark.slow
def test_legacy_depth_cli_end_to_end(tmp_path):
    """Train the legacy depth classifier on a synthetic scene where depth
    correlates with brightness, then run inference-on-image — the
    depth_estimation.lua driver pair (:188-338 training, :340-404 -i path)."""
    import numpy as np
    from PIL import Image

    h, w = 96, 128
    root = tmp_path / "legacy"
    os.makedirs(root / "images")
    os.makedirs(root / "depths")
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    stripes = 0.5 + 0.4 * np.sin(2 * np.pi * (xx + yy) / 4.0)
    for i in range(4):
        # left half textured + near (depth 4), right half flat + far
        # (depth 40) — texture, not brightness: the CNN's subtractive
        # normalization removes DC offsets entirely
        img = np.full((h, w), 0.5, np.float32)
        img[:, : w // 2] = stripes[:, : w // 2]
        img += rng.rand(h, w).astype(np.float32) * 0.05
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" / f"{i:09d}.png")
        xs = rng.randint(0, w, 60).astype(np.float32)
        ys = rng.randint(0, h, 60).astype(np.float32)
        depth = np.where(xs < w // 2, 4.0, 40.0).astype(np.float32)
        np.savez(root / "depths" / f"{i:09d}.npz", x=xs, y=ys, depth=depth)

    from depth_estimation_tpu.cli import depth_estimation
    out = str(tmp_path / "legacy_model")
    rc = depth_estimation.main([
        "-rd", str(root), "-d", "1", "-ni", "3",
        "-n", "160", "-m", "32", "-e", "8", "-nc", "2",
        "-hi", str(h), "-wi", str(w), "-bs", "16",
        "-o", out, "-i", "0",
    ])
    assert rc == 0
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["n_classes"] == 2 and meta["cut_depth"] > 0
    # per-epoch accuracy history persists for the quality dossier
    assert len(meta["score"]) == 8
    assert all(0.0 <= e["test_acc"] <= 1.0 for e in meta["score"])
    assert os.path.exists(os.path.join(out, "params.msgpack"))
    z = np.load(os.path.join(out, "depth_classes_000000000.npz"))
    cm = z["classes"]
    assert cm.ndim == 2
    # the class map must separate near (left) from far (right)
    left = (cm[:, : cm.shape[1] // 2] == 0).mean()
    right = (cm[:, cm.shape[1] // 2:] == 0).mean()
    assert left > 0.7 and right < 0.3, (left, right)
    # reload path: -lw skips training and can re-run inference
    rc2 = depth_estimation.main([
        "-rd", str(root), "-d", "1", "-ni", "3",
        "-hi", str(h), "-wi", str(w),
        "-o", out, "-lw", out, "-i", "1",
    ])
    assert rc2 == 0
    assert os.path.exists(os.path.join(out, "depth_classes_000000001.npz"))


@pytest.mark.slow
def test_radial_tester_cli_with_dense_baseline(tmp_path):
    """The radial tester streaming loop incl. the dense-flow comparison
    column (celiu standing in for the reference's OpenCV Farneback,
    test_radial_opticalflow.lua:231-237)."""
    import jax.numpy as jnp
    from depth_estimation_tpu.flow.celiu import bilinear_sample, gaussian_smooth
    from PIL import Image
    rng = np.random.RandomState(1)
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
        frame = forward_step(frame, 1.03, 1.10)

    from depth_estimation_tpu.cli import test_radial
    out = str(tmp_path / "panels")
    rc = test_radial.main([
        "-rd", str(tmp_path / "seq"),
        "-cal", "test128x160",
        "-net", "[[3,5,5,8]]",
        "-hwin", "5", "-hi", "64", "-wi", "64",
        "-ni", "2", "-o", out, "-cmp",
    ])
    assert rc == 0
    panels = sorted(os.listdir(out))
    assert any(p.endswith(".png") and "_dense" not in p for p in panels)
    assert any(p.endswith("_dense.png") for p in panels), panels
    # panels are RGB images of the flow2depth output size
    from PIL import Image as PILImage
    im = np.asarray(PILImage.open(os.path.join(out, panels[0])))
    assert im.ndim == 3 and im.shape[2] == 3


def test_opticalflow_cli_cc_mean_gt(tmp_path):
    """-gt cc-mean end-to-end: the trainer runs with the soft-argmax GT
    generator and caches under the mean/ split."""
    root = make_sequence(tmp_path, n=3, h=64, w=80, dx=2)
    out = str(tmp_path / "models")
    from depth_estimation_tpu.cli import opticalflow
    rc = opticalflow.main([
        "--root-directory", root,
        "--num-input-images", "3",
        "--n-train-set", "32", "--n-test-set", "16",
        "--num-epochs", "1",
        "--n-features", "8", "--kernel1-size", "5", "--num-layers", "1",
        "--window-size", "6", "--gt-window-size", "6",
        "--batch-size", "16", "--calibration", "test64x80",
        "--groundtruth", "cc-mean",
        "--output-model-dir", out,
    ])
    assert rc == 0
    mean_caches = []
    for dirpath, _, files in os.walk(os.path.join(root, "flow")):
        if os.sep + "mean" + os.sep in dirpath + os.sep:
            mean_caches.extend(files)
    assert mean_caches, "cc-mean GT cache not written under mean/"
