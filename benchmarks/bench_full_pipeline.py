"""Batched FULL online pipeline throughput on the TPU chip.

The one number the headline bench (bench.py) does NOT measure: the
reference's complete per-frame program — undistort -> ego-motion
(Shi-Tomasi corners + pyramidal LK + RANSAC essential fit) ->
rotation-compensate previous features -> fused match -> decode ->
warp-mask erosion -> confidence gate -> bad-frame zeroing -> depth rule
(/root/reference/depth_estimation_api.lua:134-198 + computeDepthMapFromFlow)
— exactly what api.DepthEstimator._step computes, batched over B
independent frame pairs per dispatch (api.make_batched_pipeline).

Target: >= 500 frame-pairs/sec/chip (BASELINE.md north star). Writes
``full_pipeline_fps`` into benchmarks/results.json.

Usage: python benchmarks/bench_full_pipeline.py [--batch B] [--head mean]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(fn, n, per):
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / (n * per)


def main():
    ap = argparse.ArgumentParser()
    # Measured-best dispatch size on one v5e chip: 128 for ALL modes.
    # Fast 711@32 -> 845@64 -> 894@128 (plateau 891@256); banded 573 ->
    # 643 -> 660. Parity used to prefer 32 (the unconditional gather's
    # issue rate did not scale: 278@32 -> 212@128) — the speculative
    # dispatch (undistort.remove_ego_motion_exact) routes covered batches
    # through the banded Pallas kernel, so parity now scales like banded:
    # 567@32 -> 657@128 -> 636@256.
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--head", default="mean", choices=("mean", "max"))
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16", "float16"),
                    help="matcher feature storage type (2-byte storage is "
                         "the measured-faster inference option; f16 is the "
                         "higher-mantissa 2-byte variant, README)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--fast", action="store_true",
                    help="throughput knobs: decode-side rotation "
                         "compensation (gather-free), ego-motion on a "
                         "2x-downsampled frame, 6 LK iterations (accuracy "
                         "deltas tested; see BatchedDepthEstimator)")
    ap.add_argument("--warp-banded", action="store_true",
                    help="parity knobs but the gather-free banded shift-sum "
                         "warp (exact within the search margin, band-masked "
                         "beyond; reference stage order preserved)")
    ap.add_argument("--corners", default=None, choices=("topk", "grid"),
                    help="corner selection rule (default: topk parity; "
                         "grid = sort-free per-cell argmax, rotation "
                         "agreement tested). Measured same-day on the "
                         "chip: grid 906.0 vs topk 903.9 fps in fast mode "
                         "at B=128 — a wash, so the parity topk rule "
                         "stays the recorded default (re-probed at the "
                         "round-5 lk_search=24 operating point: 1100.5 "
                         "vs 1093.3 — still a wash)")
    args = ap.parse_args()
    assert not (args.fast and args.warp_banded)

    from depth_estimation_tpu.api_batched import BatchedDepthEstimator
    from depth_estimation_tpu.geometry import Geometry
    from depth_estimation_tpu.geometry3d.calibration import ARDRONE
    from depth_estimation_tpu.models.flow import FlowModel

    # canonical online geometry (opticalflow.lua:122-140: 640x480 camera
    # frames, matching at 320x180, 10 features, 16x16 window) with the
    # ardrone calibration the reference's online loop uses
    g = Geometry(hImg=180, wImg=320, layers=((3, 16, 16, 10),),
                 maxh=16, maxw=16)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(0))

    B = args.batch or 128
    est = BatchedDepthEstimator(
        g, params, ARDRONE, head=args.head,
        match_dtype={"bfloat16": jnp.bfloat16, "float16": jnp.float16,
                     "float32": jnp.float32}[args.dtype],
        warp_dtype=jnp.bfloat16 if args.fast else None,
        compensation=("decode" if args.fast
                      else "warp_banded" if args.warp_banded else "warp"),
        lk_iters=5 if args.fast else 10,
        ransac_samples=48 if args.fast else 64,
        state_dtype=jnp.bfloat16 if args.fast else None,
        ego_downsample=2 if args.fast else 1,
        # 24 = classic LK's own capture envelope (margin 8 >= win/2);
        # measured +16% fps AND closer to ground truth than 32 on the
        # pan fixture (the tighter window rejects drifty track tails) —
        # see api_batched lk_search and tests/test_batched_pipeline.py
        lk_search=24 if args.fast else 32,
        corner_selector=args.corners or "topk",
        # pure blocking factor (outputs identical, tested); 32 rows/block
        # measured fastest at this shape in every mode
        match_block=32)

    rng = np.random.RandomState(0)
    # textured frames (Shi-Tomasi needs corners; pure noise would track
    # nothing and make RANSAC degenerate): smooth random texture + shift.
    # uint8, as a real camera delivers (api normalizes on device; f32 input
    # would quadruple the per-frame HBM read for no physical reason)
    base = rng.rand(B, 120, 160, 3).astype(np.float32)
    frames1 = np.asarray(jax.image.resize(
        jnp.asarray(base), (B, 480, 640, 3), "bilinear"))
    frames2 = np.roll(frames1, -3, axis=2)
    frames1 = jnp.asarray((frames1 * 255).astype(np.uint8))
    frames2 = jnp.asarray((frames2 * 255).astype(np.uint8))

    t0 = time.perf_counter()
    est.reset(frames1)
    out = est.next_frames(frames2)
    fetch(out)
    print(f"compile+first run: {time.perf_counter() - t0:.1f} s", flush=True)
    n_good = int(np.asarray(out[3]).sum())
    print(f"good frames: {n_good}/{B}")

    # streaming regime: one prep per STEP (the prior frame's features are
    # device state, exactly the reference's online loop accounting)
    dt = timed(lambda: est.next_frames(frames2), args.iters, B)
    fps = 1.0 / dt
    print(f"full pipeline: {dt * 1e3:.3f} ms/pair = {fps:.1f} fps "
          f"(B={B}, head={args.head}, {args.dtype}"
          f"{', fast' if args.fast else ''}"
          f"{', corners=' + args.corners if args.corners else ''})")

    if args.corners == "grid":
        # probe only — recorded keys stay parity-selected until the grid
        # rule is promoted (agreement is tested, speed needs the chip)
        print(json.dumps({"probe_grid_corners_fps": round(fps, 1),
                          "vs_target": round(fps / 500.0, 3)}))
        return

    path = os.path.join(os.path.dirname(__file__), "results.json")
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    # two keys: the parity path (reference's exact warp-then-match order)
    # and the fast path (decode-side compensation etc. — all stages still
    # computed, formulations/precision differ as documented + tested)
    key = ("full_pipeline_fps" if args.fast
           else "full_pipeline_warp_banded_fps" if args.warp_banded
           else "full_pipeline_parity_fps")
    results[key] = round(fps, 1)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({key: round(fps, 1),
                      "vs_target": round(fps / 500.0, 3)}))


if __name__ == "__main__":
    main()
