"""Matcher implementation shootout at bench scale (640x480, K=10, 16x16).

Findings recorded here so future rounds don't re-learn them:
  * plain-XLA MXU band-matmul (match_flow_mxu) is ~7x SLOWER than the Pallas
    VPU kernel: the per-shift gram matrices materialize in HBM (~48 GB of
    traffic at this scale) and the K=10 contraction pads to the MXU's native
    128 (12.8x wasted MACs). MXU only pays off for feature counts near 128.
  * match_flow_fast (norm-decomposed, no softmax rescaling) is the lean VPU
    formulation: ~24 ALU ops per displacement-pixel vs ~46.
  * bf16 feature storage gives ~1.15-1.2x on either Pallas kernel (loads
    halve; VPU ALU rate unchanged).
  * round-2 numbers at this 640x480/K=10 shape: pallas f32 b8 458 fps,
    pallas bf16 b16 543 fps, fast f32 b8/b16 444/507 fps, mxu bf16 26 fps.
    The winner is SHAPE-DEPENDENT: at the headline's 320x180 feature shape
    the fast+bf16 combination wins instead (0.404 vs 0.436 ms/pair) — see
    README roofline notes; bench.py uses fast+bf16.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depth_estimation_tpu.ops import matching, matching_experimental

maxh = maxw = 16
B, H, W, K = 4, 465, 625, 10
rng = np.random.RandomState(0)
f1 = jnp.asarray(rng.rand(B, H, W, K), jnp.float32)
f2 = jnp.asarray(rng.rand(B, H + 15, W + 15, K), jnp.float32)


def sync(x):
    import jax.numpy as jnp
    float(jnp.ravel(jax.tree.leaves(x)[1])[0])


VARIANTS = [
    ("pallas f32 b8", lambda: matching.match_flow_fused(f1, f2, maxh, maxw, 8)),
    ("pallas bf16 b16", lambda: matching.match_flow_fused(
        f1, f2, maxh, maxw, 16, False, False, jnp.bfloat16)),
    ("fast f32 b8", lambda: matching.match_flow_fast(f1, f2, maxh, maxw, 8)),
    ("fast f32 b16", lambda: matching.match_flow_fast(f1, f2, maxh, maxw, 16)),
    ("fast bf16 b32", lambda: matching.match_flow_fast(
        f1, f2, maxh, maxw, 32, False, jnp.bfloat16)),
    # f16 STORAGE: same 2-byte loads as bf16 but 10 mantissa bits — in
    # INTERPRET mode the norm-decomposed fast kernel lands IN the 0.1 px
    # budget with f16 (0.0065 px mean EPE on a trained model vs ~1 px
    # bf16 measured on-chip). Becoming the production kernel needs BOTH
    # (a) these rows matching bf16 speed and (b) the precision table
    # re-measured ON the TPU confirming the budget (interpret-mode
    # precision has disagreed with the chip before — fast bf16).
    ("pallas f16 b16", lambda: matching.match_flow_fused(
        f1, f2, maxh, maxw, 16, False, False, jnp.float16)),
    ("fast f16 b32", lambda: matching.match_flow_fast(
        f1, f2, maxh, maxw, 32, False, jnp.float16)),
    ("mxu bf16 b8", lambda: matching_experimental.match_flow_mxu(f1, f2, maxh, maxw, 8)),
]

if __name__ == "__main__":
    for name, fn in VARIANTS:
        t0 = time.perf_counter()
        try:
            out = fn()
            sync(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        N = 10
        for _ in range(N):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / (N * B)
        print(f"{name}: compile {compile_t:.0f}s, {dt*1e3:.2f} ms/pair "
              f"-> {1/dt:.0f} fps", flush=True)
