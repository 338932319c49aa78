"""One-off probe: which Pallas loop structure measures the highest VPU
issue rate? The peak meter must report a rate >= what any real kernel
sustains (speed_of_light's contract); the fused matcher demonstrably
sustains ~2.6 TFLOP/s-equivalent, so a 2.1 TF/s "ceiling" is an
under-measurement.

TRAP (measured here): a chain of FMAs with CONSTANT coefficients
(v <- v*a + b) is affine in v, and the compiler composes the whole chain
into ONE fma — the "measured" rate then counts folded-away work (a 64-FMA
Horner chain read 56 TF/s from a 0.3 ms program). Every chain below is the
logistic step v <- v - v*v: one fnma instruction, non-affine, impossible
to fold; the iterate decays ~1/n and stays well away from denormals over
the 4096 total steps.

Run: python benchmarks/probe_vpu_peak.py   (TPU; --cpu for harness test)
"""

import sys
import time

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    tpu = jax.default_backend() == "tpu"
    interpret = not tpu
    rows, cols = (64, 512) if tpu else (8, 128)
    nblk = 128 if tpu else 1
    n_iter = 128 if tpu else 2

    def run(op, ops_per_elem_iter, name):
        def body(x_ref, o_ref):
            x = x_ref[...]
            o_ref[...] = jax.lax.fori_loop(
                0, n_iter, lambda _, v: op(v), x)
        spec = pl.BlockSpec((1, rows, cols), lambda b: (b, 0, 0))
        x = jnp.full((nblk, rows, cols), 0.5, jnp.float32)
        f = jax.jit(lambda x: pl.pallas_call(
            body, grid=(nblk,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            interpret=interpret)(x))
        out = f(x)
        float(out[0, 0, 0])
        nop = jax.jit(lambda v: v + 1.0)
        float(nop(jnp.float32(1.0)))
        t0 = time.perf_counter()
        float(nop(jnp.float32(2.0)))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(x)[0, 0, 0])
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        rate = nblk * rows * cols * n_iter * ops_per_elem_iter / dt
        print(f"{name:24s} {rate/1e9:8.1f} GFLOP/s-equiv  ({dt*1e3:.1f} ms)",
              flush=True)
        return rate

    U = 64

    def logi1(v):
        for _ in range(U):
            v = v - v * v
        return v

    def logi2(v):
        a, b = v, v * 0.5
        for _ in range(U // 2):
            a = a - a * a
            b = b - b * b
        return a + b

    def logi4(v):
        cs = [v * (0.3 + 0.1 * i) for i in range(4)]
        for _ in range(U // 4):
            cs = [c - c * c for c in cs]
        return (cs[0] + cs[1]) + (cs[2] + cs[3])

    def logi8(v):
        cs = [v * (0.3 + 0.05 * i) for i in range(8)]
        for _ in range(U // 8):
            cs = [c - c * c for c in cs]
        s = cs[0]
        for c in cs[1:]:
            s = s + c
        return s

    # fnma = 2 flops/elem/step; setup muls + combine adds counted too
    run(logi1, 2.0 * U, "1 chain  x64")
    run(logi2, 2.0 * U + 2.0 + 1.0, "2 chains x32")
    run(logi4, 2.0 * U + 4.0 + 3.0, "4 chains x16")
    run(logi8, 2.0 * U + 8.0 + 7.0, "8 chains x8")


if __name__ == "__main__":
    main()
