"""Serving exports: hermetic StableHLO artifacts of the inference programs.

The deployment regime the reference handles with its C++ API boundary
(/root/reference/depth_estimation_api.lua consumed from ardrone/ C++): a
serving host should not need the research package, its model classes, or
checkpoint parsing — just a program and its weights. On TPU the natural
artifact is a serialized `jax.export` module: the jitted inference program
with the trained parameters folded in as constants, versioned StableHLO,
reloadable with jax alone and jit-compiled on the serving host (the
persistent compilation cache, utils/compcache.py, makes that a one-time
cost per host).

Two convenience exporters cover the production programs:
  * export_flow_forward — the flagship single-scale fused forward
    (filter -> fused Pallas match -> WTA/soft-argmax);
  * export_pipeline_pairs — the COMPLETE batched online program of
    api_batched.make_batched_pipeline (undistort -> ego-motion ->
    compensation -> match -> masks -> depth) over B frame pairs.

Artifacts are lowered for the platform they are exported on (export on the
TPU host for TPU serving). Use `load_exported(path).call(*args)` to serve.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .geometry import Geometry


def export_jitted(fn, example_args, path: str | None = None) -> bytes:
    """Serialize jitted ``fn`` traced at ``example_args`` (a StableHLO
    artifact with any closed-over arrays embedded as constants). Returns
    the bytes; also writes them to ``path`` when given."""
    exp = jax_export.export(jax.jit(fn))(*example_args)
    data = exp.serialize()
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(data)
    return data


def load_exported(path_or_bytes):
    """Deserialize an artifact; returns the jax.export.Exported — call it
    via ``.call(*args)`` (jit-compiles on first use on the serving host)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            data = fh.read()
    return jax_export.deserialize(data)


def export_flow_forward(geometry: Geometry, params, path: str | None = None,
                        dtype=jnp.float32) -> bytes:
    """Flow forward with ``params`` embedded. Single-scale geometry:
    models/flow.py forward_fused, artifact signature (hImg, wImg, 3) x2 ->
    (idx, ey, ex, pmax); multiscale geometry: the full-image multiscale
    WTA decode (decode_full), signature -> (flow_y, flow_x) int32 maps.
    ``dtype`` = matcher feature storage / staged-decode compute type (bf16
    is the single-scale in-budget inference option, README)."""
    g = geometry
    if g.multiscale:
        from .models.multiscale import MultiscaleFlowModel
        model = MultiscaleFlowModel(g, decode_dtype=dtype)

        def forward(img1, img2):
            return model.decode_full(params, img1, img2)
    else:
        from .models.flow import FlowModel, crop_features_center
        from .ops import matching
        model = FlowModel(g)

        def forward(img1, img2):
            f1 = crop_features_center(g, model.features(params, img1))
            f2 = model.features(params, img2)
            return matching.match_flow_fused(f1, f2, g.maxh, g.maxw, 8,
                                             False, False, dtype)

    ex = jnp.zeros((g.hImg, g.wImg, 3), jnp.float32)
    return export_jitted(forward, (ex, ex), path)


def export_pipeline_pairs(geometry: Geometry, params, cal,
                          batch: int, frame_hw=(480, 640),
                          path: str | None = None, **knobs) -> bytes:
    """The complete batched per-frame program (api_batched
    .make_batched_pipeline) with ``params`` embedded: artifact signature
    (B, h, w, 3) uint8 x2 -> (xflow, mask, depth, good). ``knobs`` pass
    through to BatchedDepthEstimator (compensation, corner_selector,
    match_dtype, ...)."""
    from . import api_batched as apib
    pipeline = apib.make_batched_pipeline(geometry, cal, **knobs)
    h, w = frame_hw
    ex = jnp.zeros((batch, h, w, 3), jnp.uint8)
    return export_jitted(lambda a, b: pipeline(params, a, b), (ex, ex), path)


def cmd_export(args) -> int:
    """`tools export`: write a serving artifact for a trained model dir."""
    from .models import io as mio
    from .geometry3d import calibration as calmod
    g, _, params, _ = mio.load_model(args.model)
    out = args.out or os.path.join(args.model, "serving.stablehlo")
    if args.pipeline:
        cal = (calmod.Calibration.load(args.cal) if args.cal
               else calmod.ARDRONE)
        data = export_pipeline_pairs(g, params, cal, args.batch, path=out)
    else:
        dt = jnp.bfloat16 if args.bf16 else jnp.float32
        data = export_flow_forward(g, params, path=out, dtype=dt)
    print(f"wrote {out} ({len(data)} bytes, platform "
          f"{jax.default_backend()})")
    return 0
