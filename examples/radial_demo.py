"""Radial/polar depth streaming demo: synthesize a forward-motion sequence
over a two-depth scene, run the full radial tester pipeline (ego-motion ->
epipole -> polar warp -> 1-D radial matcher -> flow2depth -> HSL panels).

Run: python examples/radial_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax.numpy as jnp
    from PIL import Image

    from depth_estimation_tpu.flow.celiu import bilinear_sample, gaussian_smooth
    from depth_estimation_tpu.cli import test_radial

    here = os.path.dirname(os.path.abspath(__file__))
    seq = os.path.join(here, "radial_seq")
    os.makedirs(os.path.join(seq, "images"), exist_ok=True)

    rng = np.random.RandomState(0)
    H, W = 180, 340
    base = np.asarray(gaussian_smooth(
        jnp.asarray(rng.rand(H, W, 3).astype(np.float32)), 0.8, 2))
    base = np.clip(base * 1.5, 0, 1).astype(np.float32)

    def forward_step(img, s_top, s_bottom):
        cy, cx = H / 2, W / 2
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        s = np.where(yy < cy, s_top, s_bottom)
        return np.asarray(bilinear_sample(
            jnp.asarray(img),
            jnp.asarray(cx + (xx - cx) / s), jnp.asarray(cy + (yy - cy) / s)))

    frame = base
    for i in range(6):
        Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(seq, "images", f"{i:09d}.png"))
        frame = forward_step(frame, 1.03, 1.09)

    rc = test_radial.main([
        "-rd", seq,
        "-cal", "rectified_gopro_small",
        "-net", "[[3,5,5,10]]",
        "-hwin", "10", "-hi", "128", "-wi", "128",
        "-ni", "5",
        "-o", os.path.join(here, "radial_out"),
    ])
    print("radial demo exit:", rc,
          "->", sorted(os.listdir(os.path.join(here, "radial_out"))))
    return rc


if __name__ == "__main__":
    sys.exit(main())
