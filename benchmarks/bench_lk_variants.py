"""LK correlation-surface formulation shootout (TPU).

track_lk_windowed builds two per-point cross-correlation surfaces per
pyramid level (corr_x/corr_y: window (N,S,S) x template-gradient
(N,kw,kw) -> (N,P,P), P = S-kw+1). The shipped form is a grouped conv
with feature_group_count=N (one group per tracked point) — structurally
right, but grouped/depthwise convs with hundreds of single-channel
groups lower poorly on TPU. The full-pipeline stage profile at B=128
puts the whole LK stage at ~0.73 ms/pair while the corr construction's
arithmetic is only ~325 MFLOP/item (~0.44 TFLOP/s effective — far under
the VPU roofline).

Variants timed here at the pipeline-realistic shape (vmapped B, N=400,
S=32, kw=13, both surfaces from one window):

  conv_nchw   — the shipped grouped conv (NCHW/OIHW, HIGHEST)
  conv_nhwc   — same contraction, NHWC/HWIO depthwise layout
  shift_sum   — batch-LAST static-shift FMA: transpose to (S,S,N) so
                points fill the lanes, then kw*kw static slices each
                fused-multiply-added into (P,P,N) accumulators; both
                surfaces share every slice. Pure elementwise VPU work,
                no gather, no conv lowering.

MEASURED (v5e, B=128, 2026-08-20) — the conv form WINS and stays:

  conv_nchw    11.17 ms   0.087 ms/pair   1.24 TFLOP/s
  conv_nhwc    11.14 ms   0.087 ms/pair   1.24 TFLOP/s
  shift_sum    63.14 ms   0.493 ms/pair   0.22 TFLOP/s

Negative result, recorded deliberately: the 169-term static-shift FMA
chain is 5.7x SLOWER than the grouped conv it was meant to replace —
169 offset slices of a (B,S,S,N) operand defeat XLA's fusion (each
re-reads the window from HBM; ~82 MB of accumulator traffic per item
batch), while Mosaic's conv lowering keeps the window resident and
reuses it across taps. The "batch-on-lanes + static shifts" rule that
wins for the banded warp does NOT transfer to kernels with hundreds of
taps. Corr construction at 0.087 ms/pair is ~1/3 of the measured 0.73
ms/pair LK stage (profile_full_pipeline.py); the rest is the one-hot
window gathers + pyramid prep, already matmul-formulated — the LK
tracker is left as shipped.

Usage: python benchmarks/bench_lk_variants.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import depth_estimation_tpu  # noqa: F401  (compile cache)

N, S, KW = 400, 32, 13
P = S - KW + 1


def fetch(x):
    float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(fn, n=10):
    out = fn()
    fetch(out)
    # subtract the tunnel fetch RTT (bench.py methodology): at n=10 each
    # per-call time otherwise carries ~2.9 ms of fetch overhead, which
    # compressed the recorded conv-vs-shift-sum ratio (5.7x raw ~= 7.3x
    # RTT-corrected on the same run)
    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(1.0)))
    t0 = time.perf_counter()
    float(nop(jnp.float32(2.0)))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


def corr_conv_nchw(wnd, tx, ty):
    dn = jax.lax.conv_dimension_numbers(
        (1, 1, S, S), (1, 1, KW, KW), ("NCHW", "OIHW", "NCHW"))

    def one(k):
        return jax.lax.conv_general_dilated(
            wnd[None], k[:, None], (1, 1), "VALID",
            dimension_numbers=dn, feature_group_count=N,
            precision=jax.lax.Precision.HIGHEST)[0]
    return one(tx), one(ty)


def corr_conv_nhwc(wnd, tx, ty):
    dn = jax.lax.conv_dimension_numbers(
        (1, S, S, N), (KW, KW, 1, N), ("NHWC", "HWIO", "NHWC"))
    w = jnp.transpose(wnd, (1, 2, 0))[None]            # (1, S, S, N)

    def one(k):
        kk = jnp.transpose(k, (1, 2, 0))[:, :, None]   # (KW, KW, 1, N)
        out = jax.lax.conv_general_dilated(
            w, kk, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=N, precision=jax.lax.Precision.HIGHEST)
        return jnp.transpose(out[0], (2, 0, 1))
    return one(tx), one(ty)


def corr_shift_sum(wnd, tx, ty):
    w = jnp.transpose(wnd, (1, 2, 0))                  # (S, S, N)
    gx = jnp.transpose(tx, (1, 2, 0))                  # (KW, KW, N)
    gy = jnp.transpose(ty, (1, 2, 0))
    ax = jnp.zeros((P, P, N), wnd.dtype)
    ay = jnp.zeros((P, P, N), wnd.dtype)
    for i in range(KW):
        for j in range(KW):
            s = jax.lax.slice(w, (i, j, 0), (i + P, j + P, N))
            ax = ax + s * gx[i, j][None, None]
            ay = ay + s * gy[i, j][None, None]
    return jnp.transpose(ax, (2, 0, 1)), jnp.transpose(ay, (2, 0, 1))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)
    wnd = jnp.asarray(rng.rand(B, N, S, S).astype(np.float32))
    tx = jnp.asarray(rng.rand(B, N, KW, KW).astype(np.float32))
    ty = jnp.asarray(rng.rand(B, N, KW, KW).astype(np.float32))

    variants = {
        "conv_nchw": corr_conv_nchw,
        "conv_nhwc": corr_conv_nhwc,
        "shift_sum": corr_shift_sum,
    }
    ref = None
    for name, fn in variants.items():
        f = jax.jit(jax.vmap(fn))
        try:
            t0 = time.perf_counter()
            out = f(wnd, tx, ty)
            fetch(out)
            compile_s = time.perf_counter() - t0
            dt = timed(lambda: f(wnd, tx, ty))
        except Exception as e:  # noqa: BLE001 — shootout records failures
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
            continue
        if ref is None:
            ref = tuple(np.asarray(o) for o in out)   # both corr surfaces
        else:
            rel = max(
                float(np.max(np.abs(np.asarray(o) - r)))
                / float(np.max(np.abs(r)))
                for o, r in zip(out, ref))
            if rel >= 1e-4:
                # record and keep going — the shootout's contract is to
                # report every variant, not abort on the first bad one
                print(f"{name:12s} MISMATCH: max rel err {rel:.2e} vs "
                      f"{list(variants)[0]}")
                continue
        gflop = 2 * B * N * P * P * KW * KW * 2 / 1e9
        print(f"{name:12s} {dt*1e3:8.2f} ms  {dt*1e3/B:6.3f} ms/pair  "
              f"{gflop/dt/1e3:6.2f} TFLOP/s  (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
