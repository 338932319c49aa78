"""VMEM-resident red-black SOR sweep for the celiu IRLS solver.

The XLA form of the SOR loop (celiu.smooth_flow_sor, the port of
OpticalFlow::SmoothFlowSOR's inner loop, celiu/mex/OpticalFlow.cpp:381-427)
re-reads ~11 per-pixel coefficient planes (4 neighbor weights, 2 denominators,
2 right-hand sides, the uv-coupling plane, and the du/dv state) from HBM on
EVERY one of the n_sor iterations — the GT-generator schedule runs 40 of them
per IRLS step. At the GT working resolutions (celiu car pair: 192x256 and
below) one image's full coefficient set is ~2.5 MB, far under VMEM; this
kernel loads everything once, runs ALL n_sor red-black iterations on-chip,
and writes du/dv back once — an ~n_sor-fold cut in SOR-stage HBM traffic.

Mathematically identical to the XLA loop (same update expressions and order:
red du, red dv, black du, black dv — matching the reference's in-place scan
semantics as analyzed in smooth_flow_sor): the 5-point neighbor sums use
circular shifts (pltpu.roll) instead of zero-padded slices, which is exact
because the boundary weights w_w/w_e/w_n/w_s are already zero at the image
edge (celiu._neighbor_weights), so wrapped-around (and width-pad) neighbor
values are multiplied by zero. Pad regions hold weight 0 / denominator 1 /
rhs 0 / state 0, which keeps them exactly zero through every iteration.

Batch is a grid dimension (one program per image — vmap over Pallas operands
is not supported by Mosaic; see CLAUDE.md). Equality against the XLA loop is
property-tested in tests/test_celiu.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-image VMEM budget gate: the kernel keeps ~11 coefficient planes plus
# working temporaries resident (~17 x Hp x Wp x 4 bytes). 180k padded pixels
# is ~12 MB — safely under a v5e core's VMEM. Larger levels (e.g. 640x480)
# fall back to the XLA loop.
MAX_PADDED_PIXELS = 180_000


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def fits_vmem(h: int, w: int) -> bool:
    return _round_up(h, 8) * _round_up(w, 128) <= MAX_PADDED_PIXELS


def _sor_body(n_sor: int, alpha: float, omega: float,
              ww_r, we_r, wn_r, ws_r, denu_r, denv_r, b1_r, b2_r, ixy_r,
              du_out, dv_out):
    ww, we, wn, ws = ww_r[0], we_r[0], wn_r[0], ws_r[0]
    b1, b2, ixy = b1_r[0], b2_r[0], ixy_r[0]
    # hoist the reciprocal (the XLA loop recomputes omega/denom each
    # iteration but compiles to the same hoisted form)
    odenu = omega / denu_r[0]
    odenv = omega / denv_r[0]

    H, W = ww.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    red = (ii + jj) % 2 == 0

    def nsum(f):
        # pltpu.roll needs non-negative shifts: roll by size-1 == roll by -1.
        # Wrapped-around neighbors are killed by the zero boundary weights.
        left = pltpu.roll(f, 1, 1)        # out[:, j] = f[:, j-1]
        right = pltpu.roll(f, W - 1, 1)   # out[:, j] = f[:, j+1]
        up = pltpu.roll(f, 1, 0)
        down = pltpu.roll(f, H - 1, 0)
        return ww * left + we * right + wn * up + ws * down

    def sor_iter(_, duv):
        du, dv = duv
        for color in (red, ~red):
            s1 = -alpha * nsum(du) + ixy * dv
            du = jnp.where(color, (1 - omega) * du + odenu * (b1 - s1), du)
            s2 = -alpha * nsum(dv) + ixy * du
            dv = jnp.where(color, (1 - omega) * dv + odenv * (b2 - s2), dv)
        return du, dv

    du, dv = jax.lax.fori_loop(
        0, n_sor, sor_iter,
        (jnp.zeros((H, W), jnp.float32), jnp.zeros((H, W), jnp.float32)))
    du_out[0] = du
    dv_out[0] = dv


def sor_pallas(w_w, w_e, w_n, w_s, denom_u, denom_v, b1, b2, imdxy,
               *, alpha: float, n_sor: int, omega: float = 1.8,
               interpret: bool = False):
    """Run n_sor red-black SOR iterations from du = dv = 0 entirely in VMEM.

    All operands are (..., H, W) float32 with matching leading batch dims
    (the explicit-batch regime). Returns (du, dv) of the same shape. Exactly
    the update rule of celiu._sor_xla; equality-tested against it.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    batch_shape = w_w.shape[:-2]
    H, W = w_w.shape[-2:]
    B = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    Hp, Wp = _round_up(H, 8), _round_up(W, 128)

    def prep(x, fill):
        x = jnp.asarray(x, jnp.float32).reshape(B, H, W)
        if (Hp, Wp) == (H, W):
            return x
        return jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)),
                       constant_values=fill)

    ops = [prep(w_w, 0.0), prep(w_e, 0.0), prep(w_n, 0.0), prep(w_s, 0.0),
           prep(denom_u, 1.0), prep(denom_v, 1.0),
           prep(b1, 0.0), prep(b2, 0.0), prep(imdxy, 0.0)]

    import functools
    kernel = functools.partial(_sor_body, n_sor, float(alpha), float(omega))
    spec = pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0))
    du, dv = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec] * 9,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32)] * 2,
        interpret=interpret,
    )(*ops)
    du = du[:, :H, :W].reshape(*batch_shape, H, W)
    dv = dv[:, :H, :W].reshape(*batch_shape, H, W)
    return du, dv
