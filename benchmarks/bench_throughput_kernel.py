"""Throughput-kernel validation at 320x180 (the reference's operating
resolution), where a 128-frame lane batch fits in HBM. Compares the
per-pair-latency kernel against the batch-on-lanes kernel."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depth_estimation_tpu.ops import matching, matching_experimental

maxh = maxw = 16
H, W, K = 165, 305, 10
rng = np.random.RandomState(0)


def sync(x):
    import jax.numpy as jnp
    float(jnp.ravel(jax.tree.leaves(x)[1])[0])


def bench(name, nB, fn, iters=10):
    t0 = time.perf_counter()
    try:
        out = fn()
        sync(out)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / (iters * nB)
    print(f"{name}: compile {compile_t:.0f}s, {dt*1e3:.3f} ms/pair "
          f"-> {1/dt:.0f} fps", flush=True)


if __name__ == "__main__":
    f1s = jnp.asarray(rng.rand(4, H, W, K), jnp.float32)
    f2s = jnp.asarray(rng.rand(4, H + 15, W + 15, K), jnp.float32)
    bench("pallas fused B=4", 4,
          lambda: matching.match_flow_fused(f1s, f2s, maxh, maxw, 8))

    B = 128
    g1 = jnp.asarray(rng.rand(B, H, W, K), jnp.float32)
    g2 = jnp.asarray(rng.rand(B, H + 15, W + 15, K), jnp.float32)
    bench("throughput B=128 tw8", B,
          lambda: matching_experimental.match_flow_throughput(g1, g2, maxh, maxw, 8, 8))
    bench("throughput B=128 tw16", B,
          lambda: matching_experimental.match_flow_throughput(g1, g2, maxh, maxw, 8, 16))
    bench("fused B=128 (baseline)", B,
          lambda: matching.match_flow_fused(g1, g2, maxh, maxw, 8))
