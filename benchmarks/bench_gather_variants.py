"""Micro-shootout of the two gather-shaped hot spots of the batched full
pipeline (TPU): LK window extraction and the homography feature warp.

Window extraction (B=32, N=400 points, S=32 windows from 180x320):
  * onehot-f32 / onehot-bf16 — selection-matrix matmuls (materializes
    (B, N, S, H/W) selection tensors: HBM traffic bound)
  * rows+minor — flat row gather + minor-dim column gather (pathological)
  * dynslice — vmapped (points) dynamic_slice of (S, S) blocks
Warp (B=32, 180x320x10 features, per-item homographies):
  * flat-f32 / flat-bf16 — flattened take_along_axis 4-tap bilinear
  * vmapped — per-item 2-D gather

Decides what remove_ego_motion_batched / _gather_window should use.
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
    B, N, S, H, W = 32, 400, 32, 180, 320
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, H, W), jnp.float32)
    by = jnp.asarray(rng.randint(0, H - S, (B, N)), jnp.int32)
    bx = jnp.asarray(rng.randint(0, W - S, (B, N)), jnp.int32)

    k = jnp.arange(S, dtype=jnp.int32)

    def onehot(img, by, bx, dt):
        ii = jnp.arange(H, dtype=jnp.int32)
        jj = jnp.arange(W, dtype=jnp.int32)
        Ry = (ii == (by[:, None] + k[None])[..., None]).astype(dt)
        Cx = (jj == (bx[:, None] + k[None])[..., None]).astype(dt)
        rows = jax.lax.dot_general(Ry, img.astype(dt),
                                   (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return jax.lax.dot_general(rows.astype(dt), Cx,
                                   (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    def rows_minor(img, by, bx):
        ri = (by[:, None] + k[None]).reshape(-1)
        rows = jnp.take_along_axis(img, ri[:, None], axis=0).reshape(N, S, W)
        ci = bx[:, None] + k[None]
        return jnp.take_along_axis(rows, ci[:, None, :], axis=2)

    def dynslice(img, by, bx):
        return jax.vmap(lambda y, x: jax.lax.dynamic_slice(
            img, (y, x), (S, S)))(by, bx)

    def rowtake_colmm(img, by, bx, dt):
        # hybrid: rows via a LEADING-dim gather (the cheap axis on TPU),
        # columns via the one-hot matmul (the minor-dim gather is the
        # pathological one) — halves the selection-matmul work vs onehot
        ri = jnp.clip(by[:, None] + k[None], 0, H - 1).reshape(-1)
        rows = jnp.take(img, ri, axis=0).reshape(N, S, W)
        jj = jnp.arange(W, dtype=jnp.int32)
        Cx = (jj == jnp.clip(bx[:, None] + k[None],
                             0, W - 1)[..., None]).astype(dt)
        return jax.lax.dot_general(rows.astype(dt), Cx,
                                   (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    for name, fn in [
        ("onehot-f32", jax.jit(jax.vmap(
            lambda im, y, x: onehot(im, y, x, jnp.float32)))),
        ("onehot-bf16", jax.jit(jax.vmap(
            lambda im, y, x: onehot(im, y, x, jnp.bfloat16)))),
        ("rows+minor", jax.jit(jax.vmap(rows_minor))),
        ("dynslice", jax.jit(jax.vmap(dynslice))),
        ("rowtake+colmm-bf16", jax.jit(jax.vmap(
            lambda im, y, x: rowtake_colmm(im, y, x, jnp.bfloat16)))),
        ("rowtake+colmm-f32", jax.jit(jax.vmap(
            lambda im, y, x: rowtake_colmm(im, y, x, jnp.float32)))),
    ]:
        dt = timed(lambda fn=fn: fn(imgs, by, bx))
        print(f"window {name:12s}: {dt*1e3/B:.3f} ms/pair", flush=True)

    # ---- warp variants
    C = 10
    feats = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    xs = jnp.asarray(rng.rand(B, H, W) * (W - 1), jnp.float32)
    ys = jnp.asarray(rng.rand(B, H, W) * (H - 1), jnp.float32)

    def warp_flat(f, xs, ys, dt):
        from depth_estimation_tpu.flow.celiu import bilinear_sample
        return bilinear_sample(f.astype(dt), xs, ys)

    def warp_vmapped(f, xs, ys):
        from depth_estimation_tpu.flow.celiu import bilinear_sample
        return jax.vmap(bilinear_sample)(f, xs, ys)

    for name, fn in [
        ("flat-f32", jax.jit(lambda f, x, y: warp_flat(f, x, y, jnp.float32))),
        ("flat-bf16", jax.jit(lambda f, x, y: warp_flat(f, x, y, jnp.bfloat16))),
        ("vmapped", jax.jit(warp_vmapped)),
    ]:
        dt = timed(lambda fn=fn: fn(feats, xs, ys))
        print(f"warp   {name:12s}: {dt*1e3/B:.3f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
