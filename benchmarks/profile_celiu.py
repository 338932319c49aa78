"""Stage-share profile of the celiu variational solver at the config2 shape.

Where do config2's ms/pair go? The solver is a nest of ~8 pyramid levels
x (n_outer + k) IRLS iterations, each running derivative/weight passes, an
(n_sor + 3k)-iteration red-black SOR solve, and a bilinear gather warp.
Rather than instrument inside jit (which changes fusion), this measures
ABLATED full solves — identical program structure with one stage
neutralized — and reports the difference:

  full               the reference GT schedule (alpha=0.005, 5/1/40, B=8)
  sor~0              n_sor=1: the SOR share (39/40 of SOR time)
  warp=identity      _WARPERS['bilinear'] patched to return im2 (timing
                     probe only — results are numerically meaningless)
  both               residual = derivatives + IRLS weights + pyramid +
                     im2feature + dispatch

Run on the TPU: python benchmarks/profile_celiu.py [--batch B]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def _fetch_rtt():
    """One scalar-fetch round trip on a trivial kernel — the tunneled
    backend synchronizes only on host fetches (see bench.py), so every
    timed() window carries exactly one RTT that must be subtracted or it
    lands in the smallest ablation share."""
    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(1.0)))
    t0 = time.perf_counter()
    float(nop(jnp.float32(2.0)))
    return time.perf_counter() - t0


def timed(fn, *args, iters=3):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    rtt = _fetch_rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from depth_estimation_tpu.data.images import load_image, scale
    from depth_estimation_tpu.flow import celiu

    H, W, B = 192, 256, args.batch
    im1 = np.asarray(scale(load_image("/root/reference/celiu/car1.jpg"), H, W))
    im2 = np.asarray(scale(load_image("/root/reference/celiu/car2.jpg"), H, W))
    b1 = jnp.broadcast_to(jnp.asarray(im1), (B, H, W, 3))
    b2 = jnp.broadcast_to(jnp.asarray(im2), (B, H, W, 3))

    kw = dict(alpha=0.005, ratio=0.75, min_width=30,
              n_outer=5, n_inner=1, n_sor=40)

    results = {}

    def run(tag, warp_identity=False, n_sor=None):
        k = dict(kw)
        if n_sor is not None:
            k["n_sor"] = n_sor
        saved = celiu._WARPERS["bilinear"]
        if warp_identity:
            # timing probe only: same shapes/dtypes, no gather
            celiu._WARPERS["bilinear"] = lambda f1, f2, u, v: f2
        try:
            solve = jax.jit(
                lambda a, b: celiu.coarse2fine_flow_batched(a, b, **k))
            t = timed(solve, b1, b2)
        finally:
            celiu._WARPERS["bilinear"] = saved
        results[tag] = t
        print(f"{tag:16s} {t * 1e3 / B:8.2f} ms/pair "
              f"({B / t:.1f} pairs/s)", flush=True)

    run("full")
    run("sor~0", n_sor=1)
    run("warp=identity", warp_identity=True)
    run("both", warp_identity=True, n_sor=1)

    f, s, w, b_ = (results[k] * 1e3 / B for k in
                   ("full", "sor~0", "warp=identity", "both"))
    print(f"\nstage shares (ms/pair of {f:.2f}):")
    print(f"  SOR        {f - s:8.2f}")
    print(f"  warp       {f - w:8.2f}")
    print(f"  residual   {b_:8.2f}  (derivs + weights + pyramid + dispatch)")


if __name__ == "__main__":
    main()
