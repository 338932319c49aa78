"""Feature-trunk conv shootout: direct XLA conv vs space-to-depth forms.

The trunk (3 -> ~10 channels) is the repo's weakest kernel relative to
the chip ceiling: as a direct conv its matmul N dimension is cout=10,
~8% of the 128 lane width, and speed_of_light.py measures it at ~10%
SoL while it is ~14% of the headline step. ops/s2d_conv.py folds s x s
spatial phases into channels (N -> s^2*cout) at a zero-MAC overhead of
kh2*kw2*s^2/(kh*kw). This harness measures the break-even on the real
chip at the two production trunk shapes:

  * headline / single-scale 16x16 kernel, 3 -> 10, 320x180 frames
  * the 5x5 trainer default (opticalflow.lua -netSize), 3 -> 10

Findings (TPU v5e, 2026-08-20, B=128, f32, ms per batch):
  16x16: direct 5.29 / s=2 2.10 / s=4 1.25 / s=8 1.79  -> s=4 is 4.2x
  5x5:   direct 0.69 / s=2 0.52 / s=4 0.69             -> s=2 is 1.3x
  bf16 inputs add ~nothing on top (the matmul is MXU-bound either way
  at these N widths; bf16 halves loads, not the padded MACs).
pick_s2d_factor encodes the resulting policy (reach N >= 128 lanes,
never exceed the kernel size).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depth_estimation_tpu.ops.s2d_conv import s2d_conv

B = int(os.environ.get("TRUNK_B", "128"))
rng = np.random.RandomState(0)


def sync(x):
    float(jnp.ravel(x)[0])


def bench(fn, n=10):
    out = fn()
    sync(out)                       # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    for kh, kw, H, W in ((16, 16, 180, 320), (5, 5, 180, 320)):
        x = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
        w = jnp.asarray(rng.randn(kh, kw, 3, 10), jnp.float32)
        rows = [("direct", jax.jit(lambda a, k: s2d_conv(a, k, 1)))]
        for s in (2, 4, 8):
            if s <= min(kh, kw):
                rows.append((f"s2d s={s}",
                             jax.jit(lambda a, k, s=s: s2d_conv(a, k, s))))
        print(f"--- trunk {kh}x{kw} 3->10 @ {H}x{W} B={B} f32 ---",
              flush=True)
        base = None
        for name, fn in rows:
            dt = bench(lambda fn=fn: fn(x, w))
            base = base or dt
            print(f"{name}: {dt*1e3:.2f} ms/batch "
                  f"({dt/B*1e6:.1f} us/frame, {base/dt:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
