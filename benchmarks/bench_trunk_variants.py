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

Findings (TPU v5e, 2026-08-20) — three lessons, in increasing
importance:

1. A general s x s fold measured only ~1.3x standalone: its two real
   transposes plus the per-call kernel gather each cost more than the
   conv itself (channels-minormost layout copies pad 3 -> 128 lanes,
   up to 42x amplification; the 2-D fold was dropped for the width-only
   form whose reshapes are layout-preserving no-ops).
2. STANDALONE op timings on this tunnel are dispatch-floored (~4-6 ms
   per call when device work is smaller) and MISLEAD: this harness
   showed 1.3-1.5x for the width fold while an in-jit chained probe
   showed parity at 16x16 and a 2.5x SLOWDOWN at 5x5.
3. The only timing that decides policy is the production program:
   bench.py same-day A/B measured 3532 fps direct / 4213.6 fps s=8 /
   4192.6 fps s=16 (+19% end-to-end; two 16x16 trunks are ~a quarter
   of the headline step). In-jit per-conv: 16x16 direct 3.77 ms vs
   fold ~3.7 ms (the win appears under the real pipeline's layouts,
   not the synthetic chain); 5x5 direct 1.08 ms vs fold 2.7 ms —
   hence pick_s2d_factor folds only large-contraction trunks
   (kh*kw*cin >= 256) and stays direct for small kernels.
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
        for dt_name, dt_ in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x = jnp.asarray(rng.rand(B, H, W, 3), dt_)
            w = jnp.asarray(rng.randn(kh, kw, 3, 10), dt_)
            rows = [("direct", jax.jit(lambda a, k: s2d_conv(a, k, 1)))]
            for s in (2, 4, 8, 16):
                rows.append((f"wfold s={s}",
                             jax.jit(lambda a, k, s=s: s2d_conv(a, k, s))))
            print(f"--- trunk {kh}x{kw} 3->10 @ {H}x{W} B={B} {dt_name} ---",
                  flush=True)
            base = None
            for name, fn in rows:
                t = bench(lambda fn=fn: fn(x, w))
                base = base or t
                print(f"{name}: {t*1e3:.2f} ms/batch "
                      f"({t/B*1e6:.1f} us/frame, {base/t:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
