"""Space-to-depth VALID convolution — an MXU-utilization rewrite of the
feature trunk's conv.

Why this exists: every matcher's siamese trunk
(/root/reference/opticalflow_model.lua:45-79) convolves 3 input channels
to ~10 output channels. On the MXU a conv lowers to a matmul whose N
(output) dimension is cout; cout=10 pads to the 128-wide lane dimension
at ~8% utilization, and the trunk measures ~10% of the chip's ceiling
(benchmarks/speed_of_light.py, "conv feature trunk" row) while being
~14% of the headline step. The standard TPU remedy is space-to-depth:
tile the image into s x s phases, fold the phases of BOTH input and
output into channels, and run one conv with

    kernel:  (kh2, kw2, s*s*cin, s*s*cout),  kh2 = (kh + s - 2)//s + 1

so the matmul's N grows s^2-fold (10 -> 160 at s=4) and its contraction
s^2/ (kh/kh2)-fold. The transformed kernel is mostly zeros — the MAC
overhead is kh2*kw2*s^2 / (kh*kw) (1.56x at kh=16, s=4) — but lane
utilization rises ~s^2-fold, a large net win for small-cout trunks.

The rewrite is exact up to f32 summation order: it computes the same
dot products as the direct conv, grouped differently. Gradients flow
through the kernel gather (a linear scatter), so it trains identically.

Derivation: write output position i = s*I + p and tap di = s*Di + r - p
with r the input phase; then

    y[b, s*I+p, s*J+q, o]
      = sum_{Di,Dj,r,t,c} x2d[b, I+Di, J+Dj, (r,t,c)]
                          * w[s*Di+r-p, s*Dj+t-q, c, o]

which is a VALID conv over the space-to-depth planes with the gathered
(masked) kernel above. Positions that fall outside the original kernel
support contribute zeros.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gather_indices(kh: int, kw: int, s: int):
    """Static index/mask arrays mapping the direct kernel into the
    space-to-depth kernel: returns (di, mi, dj, mj) with
    di[Di, r, p] = s*Di + r - p clipped to [0, kh), mi the validity mask
    (and the j-axis twins)."""
    kh2 = (kh + s - 2) // s + 1
    kw2 = (kw + s - 2) // s + 1
    ar = np.arange(s)
    di = np.arange(kh2)[:, None, None] * s + ar[None, :, None] - ar[None, None, :]
    dj = np.arange(kw2)[:, None, None] * s + ar[None, :, None] - ar[None, None, :]
    mi = (di >= 0) & (di < kh)
    mj = (dj >= 0) & (dj < kw)
    return (np.clip(di, 0, kh - 1), mi.astype(np.float32),
            np.clip(dj, 0, kw - 1), mj.astype(np.float32))


def s2d_kernel(w: jnp.ndarray, s: int) -> jnp.ndarray:
    """Transform a VALID-conv kernel (kh, kw, cin, cout) into its
    space-to-depth form (kh2, kw2, s*s*cin, s*s*cout). Linear in w (a
    masked gather), so gradients flow back to the direct kernel."""
    kh, kw, cin, cout = w.shape
    di, mi, dj, mj = _gather_indices(kh, kw, s)
    kh2, kw2 = di.shape[0], dj.shape[0]
    # w2[Di, Dj, r, t, p, q, c, o] = w[di[Di,r,p], dj[Dj,t,q], c, o] * mask
    w2 = w[di[:, None, :, None, :, None], dj[None, :, None, :, None, :]]
    m = (mi[:, None, :, None, :, None] * mj[None, :, None, :, None, :])
    w2 = w2 * m[..., None, None].astype(w2.dtype)
    # -> (Di, Dj, r, t, c, p, q, o): input channel block (r, t, c) must
    # match the space_to_depth layout below; output block (p, q, o)
    # matches the depth_to_space layout.
    w2 = w2.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return w2.reshape(kh2, kw2, s * s * cin, s * s * cout)


def _space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B, Hs*s, Ws*s, C) -> (B, Hs, Ws, s*s*C), channel block (r, t, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // s, s, W // s, s, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // s, W // s, s * s * C)


def _depth_to_space(y: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B, I, J, s*s*cout) -> (B, I*s, J*s, cout), channel block (p, q, o)."""
    B, I, J, C = y.shape
    cout = C // (s * s)
    y = y.reshape(B, I, J, s, s, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, I * s, J * s, cout)


def s2d_conv(x: jnp.ndarray, w: jnp.ndarray, s: int) -> jnp.ndarray:
    """VALID conv (NHWC x HWIO -> NHWC) via space-to-depth factor ``s``.

    Same values as ``lax.conv_general_dilated(..., padding='VALID')`` up
    to f32 summation order. ``s=1`` falls back to the direct conv."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if s == 1:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[0] if squeeze else y
    B, H, W, _ = x.shape
    kh, kw = w.shape[0], w.shape[1]
    n_h, n_w = H - kh + 1, W - kw + 1
    kh2 = (kh + s - 2) // s + 1
    kw2 = (kw + s - 2) // s + 1
    # pad so every output macro-row exists: Hs = I_max + kh2 with
    # I_max = ceil(n_h/s) - 1 (padded-garbage outputs are sliced off)
    hs = ((n_h + s - 1) // s - 1) + kh2
    ws = ((n_w + s - 1) // s - 1) + kw2
    pad_h = max(hs * s - H, 0)
    pad_w = max(ws * s - W, 0)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    x2 = _space_to_depth(x[:, :hs * s, :ws * s], s)
    y2 = jax.lax.conv_general_dilated(
        x2, s2d_kernel(w, s), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = _depth_to_space(y2, s)[:, :n_h, :n_w]
    return y[0] if squeeze else y


# ---------------------------------------------------------------------------
# Trunk integration policy
# ---------------------------------------------------------------------------

def pick_s2d_factor(kh: int, kw: int, cin: int, cout: int) -> int:
    """Static heuristic for the trunk (TPU-measured,
    benchmarks/bench_trunk_variants.py): fold enough phases that the
    matmul N dimension (s*s*cout) reaches the 128 lane width, but stop
    where the zero-MAC overhead (kh2*kw2*s^2 / (kh*kw)) outweighs the
    utilization gain — measured best at N ~ 1-2 lane tiles. Disabled by
    DE_TPU_S2D=off (direct conv), forced by DE_TPU_S2D=<int>."""
    env = os.environ.get("DE_TPU_S2D", "").strip().lower()
    if env == "off":
        return 1
    if env.isdigit():
        return max(1, int(env))
    if cout >= 64:                 # already lane-efficient
        return 1
    s = 1
    while s < min(kh, kw) and s * s * cout < 128:
        s *= 2
    return s
