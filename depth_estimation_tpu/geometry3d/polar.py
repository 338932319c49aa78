"""Polar (radial) geometry: epipole-centered cartesian<->polar warps and
flow->depth conversion for forward camera motion.

Rebuilds /root/reference/radial/cartesian2polar.lua (inline-C grid builders),
radial_opticalflow_polar.lua (rmax / output bookkeeping) and
radial_opticalflow_display.lua (flow2depth + HSL colorization) as vectorized
JAX ops. In polar space centered on the epipole, forward-motion flow is
(approximately) 1-D along rows (radius), which is what the radial matcher
exploits.

Conventions: grids are (2, hdst, wdst) float32 with channel 0 = source y,
channel 1 = source x (0-based pixel coordinates); warping samples bilinearly
and fills out-of-range with 0 (torch image.warp default).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# grid builders
# ---------------------------------------------------------------------------

def get_c2p_grid(wsrc: int, hsrc: int, wdst: int, hdst: int,
                 xcenter: Optional[float] = None, ycenter: Optional[float] = None,
                 lpadding: int = 0, rpadding: int = 0,
                 rmax: Optional[float] = None, alpha: float = 1.0) -> jnp.ndarray:
    """Cartesian->polar sampling grid (getC2PMask,
    /root/reference/radial/cartesian2polar.lua:4-49): polar pixel (i, j) reads
    cartesian (y, x) = center + r*(sin th, cos th), r = kr * i^alpha,
    th = 2 pi j / wdst; the angular axis wraps, expressed by copying wrapped
    columns into l/r padding."""
    if rmax is None:
        rmax = min(hsrc // 2, wsrc // 2) - 1
    xcenter = wsrc / 2 if xcenter is None else xcenter
    ycenter = hsrc / 2 if ycenter is None else ycenter
    kr = rmax / (hdst ** alpha)
    ktheta = 2 * math.pi / wdst

    i = jnp.arange(hdst, dtype=jnp.float32)[:, None]
    j = jnp.arange(wdst, dtype=jnp.float32)[None, :]
    r = kr * i ** alpha
    theta = ktheta * j
    gy = r * jnp.sin(theta) + ycenter
    gx = r * jnp.cos(theta) + xcenter
    grid = jnp.stack([gy, gx])
    if lpadding > 0 or rpadding > 0:
        parts = []
        if lpadding > 0:
            parts.append(grid[:, :, wdst - lpadding:])
        parts.append(grid)
        if rpadding > 0:
            parts.append(grid[:, :, :rpadding])
        grid = jnp.concatenate(parts, axis=2)
    return grid


def get_p2c_grid(wsrc: int, hsrc: int, wdst: int, hdst: int,
                 xcenter: Optional[float] = None, ycenter: Optional[float] = None,
                 rmax: Optional[float] = None, alpha: float = 1.0) -> jnp.ndarray:
    """Polar->cartesian inverse grid (getP2CMask, cartesian2polar.lua:51-89):
    cartesian pixel (i, j) reads polar (row, col) =
    ((x^2+y^2)^(1/(2 alpha)) * ky, atan2(y, x) mod 2pi * kx)."""
    if rmax is None:
        rmax = min(hdst // 2, wdst // 2) - 1
    xcenter = wdst / 2 if xcenter is None else xcenter
    ycenter = hdst / 2 if ycenter is None else ycenter
    pi2 = 2 * math.pi
    kx = wsrc / pi2
    ky = hsrc / (rmax ** (1.0 / alpha))

    i = jnp.arange(hdst, dtype=jnp.float32)[:, None]
    j = jnp.arange(wdst, dtype=jnp.float32)[None, :]
    x = j - xcenter
    y = i - ycenter
    gy = (x * x + y * y) ** (0.5 / alpha) * ky
    gx = jnp.mod(jnp.arctan2(y, x) + pi2, pi2) * kx
    return jnp.stack([gy, gx])


def warp_grid(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp: out[i, j] = img(grid[0, i, j], grid[1, i, j]), zero for
    out-of-range samples (torch image.warp bilinear, pad 0). img: (H, W, C)."""
    H, W = img.shape[0], img.shape[1]
    gy, gx = grid[0], grid[1]
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    dy = (gy - y0)[..., None]
    dx = (gx - x0)[..., None]

    def at(yy, xx):
        v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        ok = ((yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1))
        return v * ok[..., None]

    out = ((1 - dy) * (1 - dx) * at(y0, x0)
           + (1 - dy) * dx * at(y0, x0 + 1)
           + dy * (1 - dx) * at(y0 + 1, x0)
           + dy * dx * at(y0 + 1, x0 + 1))
    return out


def cartesian2polar(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    return warp_grid(img, grid)


# ---------------------------------------------------------------------------
# rmax / network output bookkeeping
# ---------------------------------------------------------------------------

def get_rmax(h: int, w: int, e2) -> float:
    """Distance from the epipole to the farthest image corner
    (getRMax, /root/reference/radial/radial_opticalflow_polar.lua:4-10).
    e2 = (x, y)."""
    ex, ey = float(e2[0]), float(e2[1])
    return math.floor(math.sqrt(max(
        max(ex * ex + ey * ey, (w - ex) ** 2 + ey * ey),
        max(ex * ex + (h - ey) ** 2, (w - ex) ** 2 + (h - ey) ** 2),
    )))


def get_k_output(h_input: int, h_kernel: int, h_win: int) -> float:
    """Output shrink factor of the radial net
    (getKOutput, radial_opticalflow_polar.lua:12-16)."""
    h_polar = h_input - (h_kernel - 1) // 2 - h_win + 1
    return h_polar / h_input


# ---------------------------------------------------------------------------
# flow -> depth
# ---------------------------------------------------------------------------

def flow2depth(h_img: int, w_img: int, flow: jnp.ndarray, center,
               kinfty: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radial flow to normalized depth: depth = d / flow where d is the
    distance from the epipole; flow < 0.1 -> infinity; d <= 10 px -> no
    confidence (flow2depth, /root/reference/radial/radial_opticalflow_display.lua:6-58).
    Returns (depth / infty, confidences)."""
    infty = get_rmax(h_img, w_img, center) * kinfty
    H, W = flow.shape
    j = jnp.arange(W, dtype=jnp.float32)[None, :]
    i = jnp.arange(H, dtype=jnp.float32)[:, None]
    d = jnp.sqrt((j - center[0]) ** 2 + (i - center[1]) ** 2)
    depth = jnp.where(flow < 0.1, infty, d / jnp.maximum(flow, 0.1))
    depth = jnp.where(d > 10.0, depth, 0.0)
    confs = (d > 10.0).astype(flow.dtype)
    return depth / infty, confs


def radial_depth_cartesian(flow: jnp.ndarray, center,
                           infty: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cartesian radial depth — the offline video pipeline's ``radial()``
    (/root/reference/test_opticalflow.lua:143-216, inline C :150-189).
    flow: (2, H, W) (dy, dx). Per pixel p (relative to center):
    |flow| >= 0.2 -> depth = min(|p| / |flow|, infty), confident iff
    p_x * dx + dy * dy > 0.125 (reproduced exactly as written in the C —
    the y term multiplies dy by itself); |flow| < 0.2 -> (infty, confident).
    Returns (depth, conf)."""
    H, W = flow.shape[1], flow.shape[2]
    j = jnp.arange(W, dtype=jnp.float32)[None, :]
    i = jnp.arange(H, dtype=jnp.float32)[:, None]
    px = j - center[0]
    py = i - center[1]
    pn = jnp.sqrt(px * px + py * py)
    dy, dx = flow[0], flow[1]
    dn = jnp.sqrt(dx * dx + dy * dy)
    moving = dn >= 0.2
    depth = jnp.where(moving, jnp.minimum(pn / jnp.maximum(dn, 0.2), infty),
                      infty)
    conf = jnp.where(moving, (px * dx + dy * dy > 0.125).astype(flow.dtype),
                     1.0)
    return depth, conf


def saturate(t: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    return jnp.clip(t, lo, hi)


def hsl2rgb(hsl: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) HSL (h in [0,1]) -> (3, H, W) RGB (torch image.hsl2rgb)."""
    h, s, l = hsl[0], hsl[1], hsl[2]
    c = (1 - jnp.abs(2 * l - 1)) * s
    hp = h * 6.0
    x = c * (1 - jnp.abs(jnp.mod(hp, 2) - 1))
    zeros = jnp.zeros_like(c)
    idx = jnp.clip(hp.astype(jnp.int32), 0, 5)
    rgb_options = jnp.stack([
        jnp.stack([c, x, zeros]), jnp.stack([x, c, zeros]),
        jnp.stack([zeros, c, x]), jnp.stack([zeros, x, c]),
        jnp.stack([x, zeros, c]), jnp.stack([c, zeros, x]),
    ])
    rgb = jnp.take_along_axis(rgb_options, idx[None, None], axis=0)[0]
    m = l - c / 2
    return rgb + m[None]


def depth2color(depth: jnp.ndarray, confs: jnp.ndarray) -> jnp.ndarray:
    """HSL colorization (depth2color, radial_opticalflow_display.lua:68-76)."""
    k = 1.5
    d = saturate(depth, 0.0, 1.0)
    hsl = jnp.stack([d / k, jnp.ones_like(d), confs * 0.5])
    return hsl2rgb(hsl)


def pad_output(h_img: int, w_img: int, im: jnp.ndarray) -> jnp.ndarray:
    """Center an output map in the full frame (padOutput,
    radial_opticalflow_display.lua:78-85). im: (C, h, w)."""
    C, h, w = im.shape
    dh, dw = h_img - h, w_img - w
    out = jnp.zeros((C, h_img, w_img), im.dtype)
    return out.at[:, -(-dh // 2) - 1:-(-dh // 2) - 1 + h,
                  -(-dw // 2) - 1:-(-dw // 2) - 1 + w].set(im)
