"""Variational-flow GT generation throughput (BASELINE config 2): celiu
coarse-to-fine IRLS on the bundled car pair, single-pair and vmapped-batch
rates on the TPU chip. Also writes qualitative artifacts (flow HSV + warp)
into examples/."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from depth_estimation_tpu.data.images import load_image, scale
    from depth_estimation_tpu.flow import celiu
    from depth_estimation_tpu.utils.viz import flow2hsv, save_image

    H, W = 192, 256
    im1 = np.asarray(scale(load_image("/root/reference/celiu/car1.jpg"), H, W))
    im2 = np.asarray(scale(load_image("/root/reference/celiu/car2.jpg"), H, W))

    solve = jax.jit(lambda a, b: celiu.coarse2fine_flow(
        a, b, alpha=0.02, ratio=0.75, min_width=30,
        n_outer=4, n_inner=1, n_sor=30))

    t0 = time.perf_counter()
    u, v, warped = solve(jnp.asarray(im1), jnp.asarray(im2))
    float(u.sum())
    print(f"compile+run: {time.perf_counter() - t0:.0f}s", flush=True)

    N = 10
    t0 = time.perf_counter()
    for _ in range(N):
        u, v, warped = solve(jnp.asarray(im1), jnp.asarray(im2))
    float(u.sum())
    dt = (time.perf_counter() - t0) / N
    print(f"celiu single-pair: {dt*1e3:.1f} ms/pair -> {1/dt:.1f} pairs/s",
          flush=True)

    # NOTE: vmapping the full pyramid solver crashes the TPU worker (kernel
    # fault) at batch >= 4 on v5e / jax 0.9; B=2 works and is ~1.4x faster
    # per pair (measured: 28.6 pairs/s single, 40.3 pairs/s at B=2). The
    # recorded config2 metric (bench_configs.py) uses B=2.

    # qualitative artifacts
    exdir = os.path.join(os.path.dirname(__file__), "..", "examples")
    os.makedirs(exdir, exist_ok=True)
    flow = np.stack([np.asarray(v), np.asarray(u)])

    class _G:
        maxh = maxw = 10
    save_image(os.path.join(exdir, "car_flow_hsv.png"), flow2hsv(_G, flow))
    save_image(os.path.join(exdir, "car_warped.png"),
               np.asarray(warped).transpose(2, 0, 1))
    save_image(os.path.join(exdir, "car_frame1.png"), im1.transpose(2, 0, 1))
    print("wrote examples/car_{flow_hsv,warped,frame1}.png", flush=True)


if __name__ == "__main__":
    main()
