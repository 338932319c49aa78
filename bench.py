"""Headline benchmark: 640x480 frame-pairs/sec/chip for the COMPLETE
per-frame online program, with the dense matching core as a secondary key.

Target (BASELINE.md): >= 500 frame-pairs/sec/chip.

The primary value is the full pipeline — everything the reference's online
loop runs per frame (/root/reference/depth_estimation_api.lua:134-198):
undistort -> ego-motion (Shi-Tomasi corners + pyramidal LK + RANSAC
essential) -> rotation compensation -> conv trunk -> fused Pallas match ->
decode -> warp-mask erosion -> confidence gate -> bad-frame zeroing ->
depth rule (computeDepthMapFromFlow,
/root/reference/ardrone/ardrone_api.cpp:127-136), batched B=128 in the
video-streaming regime (api_batched.BatchedDepthEstimator, fast mode —
every stage computed; formulation/precision deltas accuracy-tested).

``matching_core`` is the historical headline (rounds 1-4): device resize
to the 320x180 working resolution + conv trunk + fused match + depth rule,
no ego-motion. Recorded alongside because it isolates the north-star op,
but the primary value is the one a user's per-frame budget actually pays
(round-4 verdict: the driver-recorded line alone overstated the per-frame
program).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N,
   "matching_core": N}
vs_baseline is value / 500 (the north-star target; the reference publishes
no numbers of its own — see BASELINE.md).

Timing methodology: on tunneled device backends (axon) block_until_ready
does not synchronize — only a host fetch does. We time N amortized calls
ending in a scalar fetch and subtract the fetch round-trip measured on a
trivial kernel.
"""

import json
import os
import time

import numpy as np

# Input dtype for the 640x480 frames. A real camera delivers uint8 (the
# reference's frame sources are 8-bit; api_batched normalizes on device) and
# the f32 version of a 128-frame batch is 472 MB of HBM read per side —
# 4x the bytes for no physical reason. Measured on the chip: u8 3499 fps
# vs f32 3422 (same day, same load) — u8 is the default; DE_TPU_BENCH_U8=0
# feeds f32 frames instead.
_INPUT_U8 = os.environ.get("DE_TPU_BENCH_U8", "1") == "1"


def main():
    # The tunneled TPU occasionally drops mid-run or rejects the first
    # compile; retry a few times before giving up (DE_TPU_BENCH_RETRIES /
    # DE_TPU_BENCH_RETRY_SLEEP to tune — e.g. longer for unattended runs).
    retries = int(os.environ.get("DE_TPU_BENCH_RETRIES", "4"))
    sleep_s = float(os.environ.get("DE_TPU_BENCH_RETRY_SLEEP", "90"))
    for attempt in range(retries):
        try:
            return _run()
        except Exception as e:  # transient compile-service / TPU hiccups
            if attempt == retries - 1:
                raise
            import sys
            print(f"bench attempt {attempt} failed ({type(e).__name__}); "
                  f"retrying in {sleep_s:.0f}s", file=sys.stderr)
            time.sleep(sleep_s)


def _run():
    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.geometry import Geometry
    from depth_estimation_tpu.models.flow import FlowModel, crop_features_center
    from depth_estimation_tpu.ops import matching

    # canonical working resolution and model shape
    # (/root/reference/opticalflow.lua:122-140: inputs 640x480, matching at
    # 320x180, 10 features, 16x16 window)
    g = Geometry(
        hImg=180, wImg=320,
        layers=((3, 16, 16, 10),),
        maxh=16, maxw=16,
    )
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(0))

    BATCH = 128
    H_IN, W_IN = 480, 640

    # device-side downscale to working resolution (the reference's
    # image.scale step) as separable triangle-kernel MATMULS on the MXU —
    # same resampling kernel as jax.image.resize, measured +7% end-to-end
    # over the jax.image.resize lowering
    # (benchmarks/bench_headline_residual.py)
    from depth_estimation_tpu.data.images import scale_batched_device

    @jax.jit
    def pipeline(params, frames1, frames2):
        if frames1.dtype == jnp.uint8:
            # normalize as part of the resize's fused producer: the uint8
            # frames are the only HBM-resident copy (4x less frame read)
            frames1 = frames1.astype(jnp.float32) / 255.0
            frames2 = frames2.astype(jnp.float32) / 255.0
        small1 = scale_batched_device(frames1, g.hImg, g.wImg)
        small2 = scale_batched_device(frames2, g.hImg, g.wImg)
        f1 = crop_features_center(g, model.features(params, small1))
        f2 = model.features(params, small2)
        # norm-decomposed fast kernel + bf16 feature storage: the fastest
        # combination, and IN BUDGET on-chip since the in-kernel-norms fix
        # (0.0516 px mean EPE delta on a trained model = the bf16 storage
        # floor, identical to fused-bf16; the earlier 1.03 px on-chip
        # reading was XLA's excess-precision pass eliding the host-side
        # quantize-once — see _fast_kernel's docstring). Headline measured
        # 3414 fps fast-bf16 vs 2874 fused-bf16 at this shape.
        # f16 STORAGE is NOT an option on this hardware: v5e Mosaic
        # rejects it outright ("Unsupported type in mosaic dialect: 'f16'");
        # the f16 rows in the quality dossier are interpret-only probes.
        # block_rows=32 measured fastest for 'fast' (64 exceeds scoped
        # VMEM at B=128); 'fused' remains the bit-parity/conf-gate kernel.
        kern = os.environ.get("DE_TPU_BENCH_KERNEL", "fast")
        if kern not in ("fused", "fast"):
            raise SystemExit(f"DE_TPU_BENCH_KERNEL={kern!r}: must be "
                             f"'fused' or 'fast'")
        dts = dict(bfloat16=jnp.bfloat16, float16=jnp.float16,
                   float32=jnp.float32)
        dt_name = os.environ.get("DE_TPU_BENCH_DTYPE", "bfloat16")
        if dt_name not in dts:
            raise SystemExit(f"DE_TPU_BENCH_DTYPE={dt_name!r}: must be one "
                             f"of {sorted(dts)}")
        dt = dts[dt_name]
        blk = int(os.environ.get("DE_TPU_BENCH_BLOCK", "32"))
        if kern == "fast":
            idx, ey, ex, pmax = matching.match_flow_fast(
                f1, f2, g.maxh, g.maxw, blk, False, dt)
        else:
            idx, ey, ex, pmax = matching.match_flow_fused(
                f1, f2, g.maxh, g.maxw, blk, False, False, dt)
        # depth from x-flow (translation magnitude m = 1)
        W = ex.shape[-1]
        cx = W / 2.0
        j = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        absflow = jnp.abs(ex)
        depth = jnp.where(absflow < 0.1, jnp.inf,
                          jnp.abs(j - cx) / jnp.maximum(absflow, 0.1))
        return ex, ey, depth, pmax

    rng = np.random.RandomState(0)
    f1 = rng.rand(BATCH, H_IN, W_IN, 3).astype(np.float32)
    f2 = rng.rand(BATCH, H_IN, W_IN, 3).astype(np.float32)
    if _INPUT_U8:
        f1 = (f1 * 255).astype(np.uint8)
        f2 = (f2 * 255).astype(np.uint8)
    f1, f2 = jnp.asarray(f1), jnp.asarray(f2)

    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(1.0)))
    out = pipeline(params, f1, f2)           # warmup/compile
    float(out[1].sum())

    t0 = time.perf_counter()
    float(nop(jnp.float32(2.0)))
    rtt = time.perf_counter() - t0

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pipeline(params, f1, f2)
    float(out[1].sum())                      # hard sync
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / (n_iters * BATCH)
    core_fps = 1.0 / dt

    # ---- primary: the COMPLETE per-frame online program -------------------
    # (api_batched fast mode, the recorded full_pipeline_fps configuration
    # of benchmarks/bench_full_pipeline.py; textured frames so Shi-Tomasi
    # tracks and the essential fit is non-degenerate)
    from depth_estimation_tpu.api_batched import BatchedDepthEstimator
    from depth_estimation_tpu.geometry3d.calibration import ARDRONE

    est = BatchedDepthEstimator(
        g, params, ARDRONE, head="mean", match_dtype=jnp.bfloat16,
        warp_dtype=jnp.bfloat16, compensation="decode", lk_iters=5,
        ransac_samples=48, state_dtype=jnp.bfloat16, ego_downsample=2,
        corner_selector="topk", match_block=32, lk_search=24)
    base = rng.rand(BATCH, 120, 160, 3).astype(np.float32)
    t1 = np.asarray(jax.image.resize(jnp.asarray(base),
                                     (BATCH, H_IN, W_IN, 3), "bilinear"))
    t2 = np.roll(t1, -3, axis=2)
    t1 = jnp.asarray((t1 * 255).astype(np.uint8))
    t2 = jnp.asarray((t2 * 255).astype(np.uint8))
    est.reset(t1)
    outp = est.next_frames(t2)
    float(jnp.ravel(outp[0])[0])             # compile + settle
    t0 = time.perf_counter()
    for _ in range(5):
        outp = est.next_frames(t2)
    float(jnp.ravel(outp[0])[0])
    dtp = max(time.perf_counter() - t0 - rtt, 1e-9) / (5 * BATCH)
    full_fps = 1.0 / dtp

    print(json.dumps({
        "metric": ("640x480 frame-pairs/sec/chip, complete online pipeline "
                   "(undistort+ego-motion+compensation+match+masks+depth); "
                   "matching_core = resize+trunk+match+depth only"),
        "value": round(full_fps, 1),
        "unit": "fps",
        "vs_baseline": round(full_fps / 500.0, 3),
        "matching_core": round(core_fps, 1),
    }))


if __name__ == "__main__":
    main()
