"""Stage-by-stage timing of the batched full pipeline (TPU) to find where
the 13.5 ms/pair goes. Each stage is jitted separately; timing by fetch."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(fn, n=5):
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    from depth_estimation_tpu.geometry import Geometry
    from depth_estimation_tpu.geometry3d.calibration import ARDRONE
    from depth_estimation_tpu.geometry3d import egomotion as ego
    from depth_estimation_tpu.geometry3d import undistort as undist
    from depth_estimation_tpu.models.flow import FlowModel, crop_features_center
    from depth_estimation_tpu.ops import matching

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    g = Geometry(hImg=180, wImg=320, layers=((3, 16, 16, 10),),
                 maxh=16, maxw=16)
    model = FlowModel(g)
    params = model.init(jax.random.PRNGKey(0))
    cal = ARDRONE
    Ks = cal.K.copy()
    Ks[0] *= g.wImg / cal.wImg
    Ks[1] *= g.hImg / cal.hImg

    rng = np.random.RandomState(0)
    base = rng.rand(B, 120, 160, 3).astype(np.float32)
    frames1 = np.asarray(jax.image.resize(
        jnp.asarray(base), (B, 480, 640, 3), "bilinear"))
    frames2 = np.roll(frames1, -3, axis=2)
    frames1 = jnp.asarray(frames1)
    frames2 = jnp.asarray(frames2)

    @jax.jit
    def prep(params, frames):
        small = jax.image.resize(frames, (B, g.hImg, g.wImg, 3), "bilinear")
        u = jax.vmap(lambda f: undist.undistort_image(f, Ks, cal.distortion))(small)
        return u, model.features(params, u)

    u1, feats1 = prep(params, frames1)
    u2, feats2 = prep(params, frames2)
    print(f"prep (resize+undistort+conv): {timed(lambda: prep(params, frames1))*1e3/B:.3f} ms/pair", flush=True)

    corners = jax.jit(lambda a: ego.good_features_to_track_batched(a, 400, 0.001))
    pts, pvalid = corners(u1)
    print(f"corners (shi-tomasi+topk):   {timed(lambda: corners(u1))*1e3/B:.3f} ms/pair", flush=True)

    corners_g = jax.jit(lambda a: ego.good_features_to_track_batched(
        a, 400, 0.001, selector="grid"))
    corners_g(u1)
    print(f"corners (grid cell-argmax):  {timed(lambda: corners_g(u1))*1e3/B:.3f} ms/pair", flush=True)

    lk = jax.jit(lambda a, b, p: jax.vmap(ego.track_lk_windowed)(a, b, p))
    pts2, status = lk(u1, u2, pts)
    print(f"LK track:                    {timed(lambda: lk(u1, u2, pts))*1e3/B:.3f} ms/pair", flush=True)

    @jax.jit
    def ransac(p1, p2, v):
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        return jax.vmap(lambda a, b, vv, k: ego.get_ego_motion_from_matches(
            a, b, vv, Ks, key=k))(p1, p2, v, keys)
    valid = pvalid & status
    em = ransac(pts, pts2, valid)
    print(f"RANSAC essential:            {timed(lambda: ransac(pts, pts2, valid))*1e3/B:.3f} ms/pair", flush=True)

    @jax.jit
    def warp(feats, R):
        return (undist.remove_ego_motion_batched(feats, Ks, R),
                undist.ego_motion_valid_mask(Ks, R, feats.shape[1],
                                             feats.shape[2]))
    w, _ = warp(feats1, em.R)
    print(f"warp features (flat gather): {timed(lambda: warp(feats1, em.R))*1e3/B:.3f} ms/pair", flush=True)

    @jax.jit
    def warp_banded(feats, R):
        return (undist.remove_ego_motion_banded(feats, Ks, R, band=8),
                undist.ego_motion_valid_mask(Ks, R, feats.shape[1],
                                             feats.shape[2], band=8))
    wb, _ = warp_banded(feats1, em.R)
    print(f"warp features (banded):      {timed(lambda: warp_banded(feats1, em.R))*1e3/B:.3f} ms/pair", flush=True)

    @jax.jit
    def match(w, feats2):
        f1 = crop_features_center(g, w)
        return matching.match_flow_fused(f1, feats2, g.maxh, g.maxw, 8,
                                         False, True, jnp.bfloat16)
    m = match(w, feats2)
    print(f"fused match (+marg):         {timed(lambda: match(w, feats2))*1e3/B:.3f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
