"""Headline residual attack (round-3 VERDICT item 4): where do the
non-matcher cycles of bench.py go, and what wins are left?

Stages timed separately at the headline shape (B=128, 640x480 -> 320x180,
16x16 window, bf16 fast kernel), then variants:
  * resize-jax     — jax.image.resize (the current bench.py stage)
  * resize-matmul  — separable one-hot-triangle matmuls on the MXU
                     (data/images._resize_operator's kernel, computed on
                     device as two einsums)
  * uint8-in       — uint8 camera frames normalized on device (quarters
                     the frame-read traffic; what a camera delivers)
  * full pipelines — current bench.py composition vs the best variant
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, n=10):
    out = fn()
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / n


def main():
    from depth_estimation_tpu.geometry import Geometry
    from depth_estimation_tpu.models.flow import FlowModel, crop_features_center
    from depth_estimation_tpu.ops import matching
    from depth_estimation_tpu.data.images import _resize_operator

    g = Geometry(hImg=180, wImg=320, layers=((3, 16, 16, 10),),
                 maxh=16, maxw=16)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(0))
    B, H_IN, W_IN = 128, 480, 640

    rng = np.random.RandomState(0)
    fr1_f32 = jnp.asarray(rng.rand(B, H_IN, W_IN, 3), jnp.float32)
    fr1_u8 = jnp.asarray((np.asarray(fr1_f32) * 255).astype(np.uint8))

    Rop = jnp.asarray(_resize_operator(H_IN, g.hImg))      # (180, 480)
    Cop = jnp.asarray(_resize_operator(W_IN, g.wImg))      # (320, 640)

    def resize_jax(f):
        if f.dtype == jnp.uint8:
            f = f.astype(jnp.float32) / 255.0
        return jax.image.resize(f, (B, g.hImg, g.wImg, 3), "bilinear")

    def resize_matmul(f):
        if f.dtype == jnp.uint8:
            f = f.astype(jnp.float32) / 255.0
        t = jnp.einsum("hH,bHWc->bhWc", Rop, f)
        return jnp.einsum("wW,bhWc->bhwc", Cop, t)

    small = resize_jax(fr1_f32)
    print(f"resize jax f32:    {timed(lambda: jax.jit(resize_jax)(fr1_f32))*1e3/B:.4f} ms/pair", flush=True)
    print(f"resize jax u8:     {timed(lambda: jax.jit(resize_jax)(fr1_u8))*1e3/B:.4f} ms/pair", flush=True)
    print(f"resize matmul f32: {timed(lambda: jax.jit(resize_matmul)(fr1_f32))*1e3/B:.4f} ms/pair", flush=True)
    print(f"resize matmul u8:  {timed(lambda: jax.jit(resize_matmul)(fr1_u8))*1e3/B:.4f} ms/pair", flush=True)
    d = jnp.abs(resize_matmul(fr1_f32) - small).max()
    print(f"matmul-vs-jax max abs diff: {float(d):.2e}", flush=True)

    conv = jax.jit(lambda p, s: model.features(p, s))
    print(f"conv trunk:        {timed(lambda: conv(params, small))*1e3/B:.4f} ms/pair", flush=True)
    f2 = conv(params, small)
    f1 = crop_features_center(g, f2)
    mt = jax.jit(lambda a, b: matching.match_flow_fast(
        a, b, g.maxh, g.maxw, 32, False, jnp.bfloat16))
    print(f"fast matcher:      {timed(lambda: mt(f1, f2))*1e3/B:.4f} ms/pair", flush=True)

    def full(resize, frames):
        def pipe(params, frames1, frames2):
            s1 = resize(frames1)
            s2 = resize(frames2)
            f1 = crop_features_center(g, model.features(params, s1))
            f2 = model.features(params, s2)
            idx, ey, ex, pmax = matching.match_flow_fast(
                f1, f2, g.maxh, g.maxw, 32, False, jnp.bfloat16)
            W = ex.shape[-1]
            cx = W / 2.0
            j = jnp.arange(W, dtype=jnp.float32)[None, None, :]
            absflow = jnp.abs(ex)
            depth = jnp.where(absflow < 0.1, jnp.inf,
                              jnp.abs(j - cx) / jnp.maximum(absflow, 0.1))
            return ex, ey, depth, pmax
        jpipe = jax.jit(pipe)
        return timed(lambda: jpipe(params, frames, frames))

    dt = full(resize_jax, fr1_f32)
    print(f"FULL jax-resize f32:    {dt*1e3/B:.4f} ms/pair = {B/dt:.0f} fps", flush=True)
    dt = full(resize_matmul, fr1_f32)
    print(f"FULL matmul-resize f32: {dt*1e3/B:.4f} ms/pair = {B/dt:.0f} fps", flush=True)
    dt = full(resize_matmul, fr1_u8)
    print(f"FULL matmul-resize u8:  {dt*1e3/B:.4f} ms/pair = {B/dt:.0f} fps", flush=True)
    dt = full(resize_jax, fr1_u8)
    print(f"FULL jax-resize u8:     {dt*1e3/B:.4f} ms/pair = {B/dt:.0f} fps", flush=True)


if __name__ == "__main__":
    main()
