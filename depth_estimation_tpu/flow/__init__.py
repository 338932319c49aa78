"""Dense flow solvers (variational celiu + comparison baseline)."""

from . import celiu  # noqa: F401


def get_optical_flow(im1, im2, **kw):
    """Dense-flow comparison baseline — the sfm2.getOpticalFlow (OpenCV
    Farneback) slot of the radial tester
    (/root/reference/radial/test_radial_opticalflow.lua:231-237). Served by
    the variational solver with fast parameters. Returns (vx, vy)."""
    params = dict(alpha=0.02, ratio=0.5, min_width=30,
                  n_outer=2, n_inner=1, n_sor=15)
    params.update(kw)
    vx, vy, _ = celiu.coarse2fine_flow(im1, im2, **params)
    return vx, vy
