"""Empirical device ceilings: MXU matmul TFLOP/s, HBM stream GB/s, VPU FMA
GFLOP/s, VPU exp/s — measured, not copied from a datasheet.

These are the denominators for benchmarks/speed_of_light.py: every hot-kernel
"% of speed-of-light" claim in this repo divides a measured kernel time by an
analytic minimum computed against THESE measured ceilings, so the roofline
story does not depend on marketing numbers (v5e nominal: 197 bf16 TFLOP/s,
819 GB/s HBM — the measured stream/matmul rates land below nominal, as they
do on every real machine).

Methodology: fetch-synced timing with RTT subtraction (tunneled backends do
not sync on block_until_ready — see bench.py). Writes
benchmarks/device_peaks.json stamped with the backend; only TPU-backed
numbers are meaningful ceilings (CPU runs exist to keep the harness tested).

Run: python benchmarks/device_peaks.py [--json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _timed(fn, sync, n=10):
    """Amortized seconds per call, RTT-subtracted (bench.py methodology)."""
    import jax
    import jax.numpy as jnp
    out = fn()
    sync(out)
    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(1.0)))
    t0 = time.perf_counter()
    float(nop(jnp.float32(2.0)))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


def measure_mxu_tflops(tpu: bool):
    """Large square bf16 matmul — the MXU's best case."""
    import jax
    import jax.numpy as jnp
    n = 8192 if tpu else 512
    a = jnp.asarray(np.random.RandomState(0).rand(n, n), jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(1).rand(n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32))
    dt = _timed(lambda: f(a, b), lambda o: float(o[0, 0]))
    return 2.0 * n ** 3 / dt / 1e12


def measure_hbm_gbps(tpu: bool):
    """Elementwise copy-scale over a large array: reads + writes it once."""
    import jax
    import jax.numpy as jnp
    elems = (128 * 1024 * 1024) if tpu else (8 * 1024 * 1024)  # 512 MB / 32 MB f32
    x = jnp.ones((elems,), jnp.float32)
    f = jax.jit(lambda x: x * 1.0000001 + 1.0)
    dt = _timed(lambda: f(x), lambda o: float(o[0]), n=5)
    return 2.0 * 4.0 * elems / dt / 1e9


def _vpu_loop_kernel(n_iter, op):
    """Pallas kernel: load one block to VMEM, run n_iter elementwise steps on
    it (values stay in vector registers), write back once — HBM traffic is
    amortized to ~zero, isolating the VPU ALU rate."""
    import jax
    from jax.experimental import pallas as pl

    def body(x_ref, o_ref):
        x = x_ref[...]

        def it(_, x):
            return op(x)

        o_ref[...] = jax.lax.fori_loop(0, n_iter, it, x)

    return body


def _measure_vpu(op, flops_per_elem_iter, tpu: bool, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    rows, cols = (256, 1024) if tpu else (8, 128)
    nblk = 32 if tpu else 1
    n_iter = 512 if tpu else 4
    x = jnp.ones((nblk, rows, cols), jnp.float32) * 0.5
    body = _vpu_loop_kernel(n_iter, op)
    spec = pl.BlockSpec((1, rows, cols), lambda b: (b, 0, 0))
    f = jax.jit(lambda x: pl.pallas_call(
        body, grid=(nblk,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=interpret)(x))
    dt = _timed(lambda: f(x), lambda o: float(o[0, 0, 0]), n=5)
    return nblk * rows * cols * n_iter * flops_per_elem_iter / dt


def measure_vpu_fma_gflops(tpu: bool, interpret: bool):
    """x*a+b per element per iteration = 2 flops (one FMA)."""
    return _measure_vpu(lambda x: x * 1.000001 + 1e-9, 2.0, tpu, interpret) / 1e9


def measure_vpu_exp_gops(tpu: bool, interpret: bool):
    """exp() throughput (the fused matcher's softmax rides on this)."""
    import jax.numpy as jnp
    return _measure_vpu(lambda x: jnp.exp(-x) + 1e-6, 1.0, tpu, interpret) / 1e9


def main():
    import jax
    if "--cpu" in sys.argv:
        # the axon TPU plugin overrides JAX_PLATFORMS; an explicit config
        # update before backend init wins (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    tpu = backend == "tpu"
    interpret = not tpu
    peaks = {
        "backend": backend,
        "mxu_bf16_tflops": round(measure_mxu_tflops(tpu), 2),
        "hbm_stream_gbps": round(measure_hbm_gbps(tpu), 1),
        "vpu_fma_f32_gflops": round(measure_vpu_fma_gflops(tpu, interpret), 1),
        "vpu_exp_gops": round(measure_vpu_exp_gops(tpu, interpret), 2),
    }
    print(json.dumps(peaks, indent=2))
    if tpu or "--json" in sys.argv:
        out = os.path.join(os.path.dirname(__file__), "device_peaks.json")
        with open(out, "w") as fh:
            json.dump(peaks, fh, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
