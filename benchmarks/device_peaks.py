"""Empirical device ceilings: MXU matmul TFLOP/s, HBM stream GB/s, VPU FMA
GFLOP/s, VPU exp/s — measured, not copied from a datasheet.

These are the denominators for benchmarks/speed_of_light.py: every hot-kernel
"% of speed-of-light" claim in this repo divides a measured kernel time by an
analytic minimum computed against THESE measured ceilings, so the roofline
story does not depend on marketing numbers.

Methodology (v2 — the round-4 verdict found v1 self-contradictory): every
rate is measured INSIDE one jitted program that repeats the operation enough
times that dispatch, tunnel RTT, and result traffic are negligible — DESIGN
rule 8 ("never time an op standalone") applied to the peak meter itself.
The v1 meter timed a single pass with RTT subtraction, which (a) drowned the
~6 ms HBM stream in ~29 ms RTT jitter (3965 "GB/s" on an 819 GB/s part) and
(b) bounded the VPU loops by VMEM round-trips, not ALU issue (887 GFLOP/s —
~6x under the ALU rate real kernels reach), making three speed-of-light rows
report >100% of the "irreducible minimum". v2 fixes both:

  * MXU: a fori_loop chain of n x n bf16 matmuls (each iteration consumes
    the previous product, so the loop cannot be elided; the elementwise
    rescale between matmuls is O(n^2) against O(n^3) matmul work).
  * HBM: a fori_loop whose body reads + writes a 512 MB array once per
    iteration (XLA double-buffers the loop carry in HBM).
  * VPU FMA: a Pallas kernel whose loop body applies 8 INDEPENDENT
    logistic chains (v <- v - v*v, one fnma) of 16 steps each per element
    per VMEM round-trip. Two traps, both measured (benchmarks/
    probe_vpu_peak.py): an affine chain (v*a + b with constant a, b)
    composes algebraically and the compiler folds the whole chain into
    ONE fma (a 64-FMA Horner chain "measured" 56 TF/s from a 0.3 ms
    program), so the step must be non-affine; and a single dependent
    chain is fnma-latency-bound (~2.1 TF/s) — 8 independent chains
    sustain ~4.6 TF/s on the same hardware, the number real multi-
    accumulator kernels actually see.
  * VPU exp: same structure, 8 independent x <- exp(-x) chains
    (converges to ~0.567, no overflow).

All four report the per-iteration rate from a >= 50 ms total program, with
one scalar fetch at the end. Only TPU-backed numbers are meaningful
ceilings; CPU runs exist to keep the harness tested (--cpu).

Run: python benchmarks/device_peaks.py [--json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _timed(fn, sync, n=10):
    """Amortized seconds per call, RTT-subtracted (bench.py methodology).
    Still used by speed_of_light.py to time PRODUCTION kernels (whose
    single-call times are >= ms and amortized over n calls); the peak
    measurements below do NOT use it — they amortize inside one program."""
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


def _timed_loop(make_fn, sync, iters, reps=3):
    """Seconds per loop iteration of a jitted fori_loop program: compile +
    warm once, then time the whole program ending in one scalar fetch.
    The program is sized >= ~50 ms so RTT (~29 ms on the tunnel) is
    subtracted as with _timed but no longer dominates the residual.
    Best of ``reps`` repetitions: a ceiling is the device's demonstrated
    CAPABILITY, and run-to-run tunnel/host noise only ever adds time
    (a 20% swing was observed on back-to-back MXU runs)."""
    import jax
    import jax.numpy as jnp
    fn = make_fn(iters)
    out = fn()
    sync(out)
    rtt = _rtt_floor()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9))
    return best / iters


def _rtt_floor(n=3):
    """Fetch round-trip FLOOR: the min of n nop fetches. A single RTT
    sample can spike past the whole measured program (one 3 s hiccup on
    the nop fetch turned an exp-rate reading into 3e18/s via the 1e-9
    clamp) — subtracting the floor can only under-subtract, which makes
    the derived rate conservative, never impossible."""
    import jax
    import jax.numpy as jnp
    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(1.0)))
    best = float("inf")
    for k in range(n):
        t0 = time.perf_counter()
        float(nop(jnp.float32(2.0 + k)))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_mxu_tflops(tpu: bool):
    """Chained large square bf16 matmuls — the MXU's best case."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    # ~200 ms of matmul work per timing: a ~20 ms program is comparable to
    # the tunnel RTT's run-to-run jitter, and best-of-N with RTT
    # subtraction then over-subtracts (a 294 "TF/s" reading on a 197 TF/s
    # part came from exactly this)
    n = 4096 if tpu else 256
    iters = 192 if tpu else 2
    a0 = jnp.asarray(np.random.RandomState(0).rand(n, n) - 0.5, jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(1).rand(n, n) - 0.5, jnp.bfloat16)

    def make(it):
        @jax.jit
        def run(a0, b):
            def body(_, a):
                c = jnp.matmul(a, b, preferred_element_type=jnp.float32)
                # keep magnitudes bounded so the chain neither overflows
                # nor denormals; O(n^2) elementwise vs O(n^3) matmul
                return (c * (1.0 / n)).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, it, body, a0)
        return lambda: run(a0, b)

    dt = _timed_loop(make, lambda o: float(o[0, 0]), iters)
    return 2.0 * n ** 3 / dt / 1e12


def measure_hbm_gbps(tpu: bool):
    """Elementwise copy-scale over a large array, repeated in-loop: each
    iteration reads + writes the array once in HBM."""
    import jax
    import jax.numpy as jnp
    elems = (128 * 1024 * 1024) if tpu else (8 * 1024 * 1024)
    iters = 96 if tpu else 4       # ~150 ms of traffic per timing
    x = jnp.ones((elems,), jnp.float32)

    def make(it):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, it, lambda _, v: v * 1.0000001 + 1e-7, x)
        return lambda: run(x)

    dt = _timed_loop(make, lambda o: float(o[0]), iters)
    return 2.0 * 4.0 * elems / dt / 1e9


def _measure_vpu(unrolled_op, ops_per_elem_iter, tpu: bool, interpret: bool,
                 nblk_tpu: int = 256, n_iter_tpu: int = 256):
    """Pallas VPU loop: each fori iteration applies ``unrolled_op`` (8
    independent non-foldable chains) to the whole VMEM block — the ALU
    work dominates the block round-trip ~64:2, so ALU issue, not VMEM
    traffic, binds. Block sized (64, 512) so the unrolled body's live
    temps fit scoped VMEM (a (256, 1024) block stack-OOMs at 21 MB).
    Sized for >= ~100 ms per timing (see measure_mxu_tflops on RTT
    jitter); callers scale nblk/n_iter to their unit's rate."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    rows, cols = (64, 512) if tpu else (8, 128)
    nblk = nblk_tpu if tpu else 1
    n_iter = n_iter_tpu if tpu else 2

    def body(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jax.lax.fori_loop(
            0, n_iter, lambda _, v: unrolled_op(v), x)

    spec = pl.BlockSpec((1, rows, cols), lambda b: (b, 0, 0))
    x = jnp.full((nblk, rows, cols), 0.5, jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        body, grid=(nblk,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=interpret)(x))

    # one program, ~100+ ms on TPU; best-of-3 with the RTT floor
    out = f(x)
    float(out[0, 0, 0])
    rtt = _rtt_floor()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x)[0, 0, 0])
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9))
    return nblk * rows * cols * n_iter * ops_per_elem_iter / best


def measure_gather_idx_gops(tpu: bool):
    """Index-processing rate of the batched flattened row gather — the
    formulation every unavoidable interpolation in this repo uses (DESIGN
    rule 3 'pack the taps': one take_along_axis over an (B, H*W, 4C)
    table). TPU gather cost is bound by indices/s, not row bytes; this is
    the denominator for the celiu packed-tap warp's speed-of-light row.
    Per fori iteration the indices are rotated by the loop counter so the
    gather cannot be CSE'd/hoisted across iterations."""
    import jax
    import jax.numpy as jnp
    B, M, Cp = (8, 192 * 256, 20) if tpu else (2, 24 * 32, 8)
    iters = 512 if tpu else 4
    rng = np.random.RandomState(3)
    table = jnp.asarray(rng.rand(B, M, Cp), jnp.float32)
    idx = jnp.asarray(rng.randint(0, M, (B, M)), jnp.int32)

    def make(it):
        @jax.jit
        def run(table, idx):
            def body(k, acc):
                ik = (idx + k) % M
                g = jnp.take_along_axis(table, ik[..., None], axis=1)
                return acc + g[:, 0, 0]
            return jax.lax.fori_loop(0, it, body,
                                     jnp.zeros((B,), jnp.float32))
        return lambda: run(table, idx)

    dt = _timed_loop(make, lambda o: float(o[0]), iters)
    return B * M / dt / 1e9


def measure_vpu_fma_gflops(tpu: bool, interpret: bool):
    """8 independent 16-step logistic chains (fnma each, non-foldable) per
    element per VMEM round-trip; setup muls + combine adds counted."""
    def chains(v):
        cs = [v * (0.3 + 0.05 * i) for i in range(8)]     # 8 muls
        for _ in range(16):
            cs = [c - c * c for c in cs]                  # 8x16 fnma
        s = cs[0]
        for c in cs[1:]:
            s = s + c                                     # 7 adds
        return s * (1.0 / 8)                              # 1 mul

    ops = 2.0 * (8 + 8 * 16 + 7 + 1)
    return _measure_vpu(chains, ops, tpu, interpret,
                        nblk_tpu=256, n_iter_tpu=256) / 1e9


def measure_vpu_exp_gops(tpu: bool, interpret: bool):
    """8 independent 4-step x <- exp(-x) chains per element per VMEM
    round-trip (the fused matcher's softmax rides on this); converges to
    ~0.567, stable. Only the exps are counted (the setup muls/combine adds
    run at the far-higher FMA rate)."""
    import jax.numpy as jnp

    def chains(v):
        cs = [v * (0.3 + 0.05 * i) for i in range(8)]
        for _ in range(4):
            cs = [jnp.exp(-c) for c in cs]
        s = cs[0]
        for c in cs[1:]:
            s = s + c
        return s * (1.0 / 8)

    # exp is ~50x slower than fma per op: smaller program, same >=100 ms
    return _measure_vpu(chains, float(8 * 4), tpu, interpret,
                        nblk_tpu=64, n_iter_tpu=48) / 1e9


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
        "methodology": "v2: rates amortized inside one jitted loop program",
        "mxu_bf16_tflops": round(measure_mxu_tflops(tpu), 2),
        "hbm_stream_gbps": round(measure_hbm_gbps(tpu), 1),
        "vpu_fma_f32_gflops": round(measure_vpu_fma_gflops(tpu, interpret), 1),
        "vpu_exp_gops": round(measure_vpu_exp_gops(tpu, interpret), 2),
        "gather_idx_gops": round(measure_gather_idx_gops(tpu), 3),
    }
    print(json.dumps(peaks, indent=2))
    if tpu or "--json" in sys.argv:
        out = os.path.join(os.path.dirname(__file__), "device_peaks.json")
        with open(out, "w") as fh:
            json.dump(peaks, fh, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
