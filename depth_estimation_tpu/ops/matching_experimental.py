"""EXPERIMENTAL matcher formulations — measured negative results, kept for
study and for the shootout in ``benchmarks/bench_matcher_variants.py``.

Production kernels live in ``ops/matching.py`` (``match_ssd``,
``match_flow_fused``, ``match_flow_fast``). The two variants here satisfy
the same output contract and are contract-tested
(``tests/test_matching_experimental.py``) but are *slower* on v5e at the
production shapes; their docstrings record why. They are not imported by
any pipeline code.

  * ``match_flow_throughput`` — batch-on-lanes Pallas layout (B on the lane
    dim). Measured 1.74 vs 1.07 ms/pair at 320x180, B=128: small spatial
    tiles re-DMA overlapping f2 slabs ~8x.
  * ``match_flow_mxu`` — cross terms as batched matmuls on the systolic
    array with a pad-reshape band extraction. Measured ~7x slower at K=10
    (pads K to 128 lanes; the workload is VPU-shaped, see README roofline).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Throughput kernel: batch-on-lanes layout
# ---------------------------------------------------------------------------

def _lanes_kernel(f1_ref, n1_ref, f2_ref, n2_ref, idx_ref, py_ref, px_ref,
                  pmax_ref, *, maxh: int, maxw: int, mid: int,
                  th: int, tw: int):
    """Batch-on-lanes variant: tensors are (K, rows, cols, B) with the frame
    batch B on the VPU lane dimension. Every VMEM load then feeds B frames
    at once — the per-frame load cost that bounds the W-on-lanes kernels
    drops by ~B — and displacement offsets touch only sublane (cols) and
    repeat (rows) dims, so no lane shifts exist at all."""
    K = f1_ref.shape[0]
    B = f1_ref.shape[3]
    f1 = f1_ref[...]                        # (K, th, tw, B)
    n1 = n1_ref[...]                        # (th, tw, B)

    halfh1 = math.ceil(maxh / 2) - 1
    halfw1 = math.ceil(maxw / 2) - 1
    neg_inf = jnp.float32(-3.4e38)
    shape = (th, tw, B)
    s = jnp.zeros(shape, jnp.float32)
    sy = jnp.zeros(shape, jnp.float32)
    sx = jnp.zeros(shape, jnp.float32)
    bi = jnp.zeros(shape, jnp.int32)
    bm = jnp.full(shape, neg_inf, jnp.float32)
    tmid = jnp.zeros(shape, jnp.float32)

    f1ks = [jax.lax.slice(f1, (k, 0, 0, 0), (k + 1, th, tw, B))[0]
            for k in range(K)]

    def dy_body(dy, carry):
        s, sy, sx, bi, bm, tmid = carry
        # dy offsets land on the third-minor (repeat) dim of the 4-D ref —
        # dynamic offsets are legal there, so dy can stay a fori_loop
        # (keeps the Mosaic unroll at maxw*K instead of maxh*maxw*K).
        for dx in range(maxw):
            d = dy * maxw + dx
            # K-accumulation over 3-D (th, tw, B) tensors — Mosaic cannot
            # lower a 4-D multi_reduction over the leading dim here
            cross = None
            for k in range(K):
                sk = f2_ref[k, pl.ds(dy, th), dx:dx + tw, :]
                cross = (f1ks[k] * sk if cross is None
                         else cross + f1ks[k] * sk)
            n2s = n2_ref[pl.ds(dy, th), dx:dx + tw, :]
            t = 2.0 * cross - n2s - n1
            better = t > bm
            bi = jnp.where(better, d, bi)
            # flash-style running-max rescaling — the same underflow fix
            # _fused/_fast carry (commit "Fix softmax underflow"): on
            # trained features costs reach hundreds and raw exp(t) flushes
            # to 0 for every cell, decoding NaN
            bm_new = jnp.maximum(bm, t)
            alpha = jnp.exp(bm - bm_new)
            p = jnp.exp(t - bm_new)
            s = s * alpha + p
            sy = sy * alpha + p * (dy - halfh1).astype(jnp.float32)
            sx = sx * alpha + p * (dx - halfw1)
            bm = bm_new
            tmid = jnp.where(d == mid, t, tmid)
        return s, sy, sx, bi, bm, tmid

    s, sy, sx, bi, bm, tmid = jax.lax.fori_loop(
        0, maxh, dy_body, (s, sy, sx, bi, bm, tmid))
    tie = tmid >= bm
    idx_ref[...] = jnp.where(tie, mid, bi)
    pmax_ref[...] = 1.0 / s          # = exp(bm - bm) / sum exp(t - bm)
    py_ref[...] = sy / s
    px_ref[...] = sx / s


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def match_flow_throughput(
    f1: jnp.ndarray, f2: jnp.ndarray, maxh: int, maxw: int,
    block_rows: int = 8, block_cols: int = 8, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EXPERIMENTAL throughput-oriented fused matcher for LARGE frame
    batches: the batch lives on the lane dimension (padded to 128) so every
    VMEM load feeds 128 frames.

    Status (jax 0.9 / v5e): decode-correct; compiles in ~80 s. MEASURED
    SLOWER than match_flow_fused (1.74 vs 1.07 ms/pair at 320x180, B=128):
    the small (8, 8) spatial tiles re-DMA overlapping f2 slabs ~8x, so the
    per-frame load savings are eaten by HBM traffic. Kept for study; use
    match_flow_fused."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    squeeze = f1.ndim == 3
    if squeeze:
        f1, f2 = f1[None], f2[None]
    B, H, W, K = f1.shape
    assert f2.shape[1] == H + maxh - 1 and f2.shape[2] == W + maxw - 1

    LB = 128                                # lane-batch granularity
    padb = (-B) % LB
    if padb:
        f1 = jnp.pad(f1, ((0, padb), (0, 0), (0, 0), (0, 0)))
        f2 = jnp.pad(f2, ((0, padb), (0, 0), (0, 0), (0, 0)))
    Bp = B + padb

    # (K, H, W, B) with B minor
    f1t = jnp.transpose(f1, (3, 1, 2, 0)).astype(jnp.float32)
    f2t = jnp.transpose(f2, (3, 1, 2, 0)).astype(jnp.float32)
    n1 = jnp.sum(f1t * f1t, axis=0)          # (H, W, Bp)
    n2 = jnp.sum(f2t * f2t, axis=0)          # (H2, W2, Bp)

    th, tw = block_rows, block_cols
    assert tw % 8 == 0, "block_cols must be 8-aligned (sublane tiling)"
    nh = -(-H // th)
    nw = -(-W // tw)
    slab_rows = th + maxh - 1
    slab_cols = -(-(tw + maxw - 1) // 8) * 8
    rows_needed = (nh - 1) * th + slab_rows
    cols_needed = (nw - 1) * tw + slab_cols
    padh1 = nh * th - H
    padh2 = max(rows_needed - f2t.shape[1], 0)
    padw1 = nw * tw - W
    padw2 = max(cols_needed - f2t.shape[2], 0)
    if padh1 or padw1:
        f1t = jnp.pad(f1t, ((0, 0), (0, padh1), (0, padw1), (0, 0)))
        n1 = jnp.pad(n1, ((0, padh1), (0, padw1), (0, 0)))
    if padh2 or padw2:
        f2t = jnp.pad(f2t, ((0, 0), (0, padh2), (0, padw2), (0, 0)))
        n2 = jnp.pad(n2, ((0, padh2), (0, padw2), (0, 0)))

    mid = (math.ceil(maxh / 2) - 1) * maxw + (math.ceil(maxw / 2) - 1)
    nb = Bp // LB
    # fold the lane-batch groups into the grid's leading dim by reshaping
    # B into (nb, LB) and moving nb next to the spatial grid
    f1t = f1t.reshape(f1t.shape[:3] + (nb, LB))
    f2t = f2t.reshape(f2t.shape[:3] + (nb, LB))
    n1 = n1.reshape(n1.shape[:2] + (nb, LB))
    n2 = n2.reshape(n2.shape[:2] + (nb, LB))

    out_shape = [
        jax.ShapeDtypeStruct((nh * th, nw * tw, nb, LB), jnp.int32),
        jax.ShapeDtypeStruct((nh * th, nw * tw, nb, LB), jnp.float32),
        jax.ShapeDtypeStruct((nh * th, nw * tw, nb, LB), jnp.float32),
        jax.ShapeDtypeStruct((nh * th, nw * tw, nb, LB), jnp.float32),
    ]

    def kernel(f1_ref, n1_ref, f2_ref, n2_ref,
               idx_ref, py_ref, px_ref, pmax_ref):
        g = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)

        def body(slab, nslab, sem, nsem):
            dma = pltpu.make_async_copy(
                f2_ref.at[:, pl.ds(i * th, slab_rows),
                          pl.ds(pl.multiple_of(j * tw, 8), slab_cols), g, :],
                slab, sem)
            dma.start()
            dma2 = pltpu.make_async_copy(
                n2_ref.at[pl.ds(i * th, slab_rows),
                          pl.ds(pl.multiple_of(j * tw, 8), slab_cols), g, :],
                nslab, nsem)
            dma2.start()
            dma.wait()
            dma2.wait()
            _lanes_kernel(f1_ref.at[:, :, :, 0], n1_ref.at[:, :, 0],
                          slab, nslab,
                          idx_ref.at[:, :, 0], py_ref.at[:, :, 0],
                          px_ref.at[:, :, 0], pmax_ref.at[:, :, 0],
                          maxh=maxh, maxw=maxw, mid=mid, th=th, tw=tw)
        pl.run_scoped(
            body,
            pltpu.VMEM((K, slab_rows, slab_cols, LB), jnp.float32),
            pltpu.VMEM((slab_rows, slab_cols, LB), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        )

    grid_spec = pl.GridSpec(
        grid=(nb, nh, nw),
        in_specs=[
            pl.BlockSpec((K, th, tw, 1, LB), lambda g, i, j: (0, i, j, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, 1, LB), lambda g, i, j: (i, j, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((th, tw, 1, LB), lambda g, i, j: (i, j, g, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )

    idx, ey, ex, pmax = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(f1t, n1, f2t, n2)

    def fix(a):
        a = a.reshape(nh * th, nw * tw, Bp)
        a = jnp.transpose(a, (2, 0, 1))
        return a[:B, :H, :W]
    idx, ey, ex, pmax = fix(idx), fix(ey), fix(ex), fix(pmax)
    if squeeze:
        idx, ey, ex, pmax = (a[0] for a in (idx, ey, ex, pmax))
    return idx, ey, ex, pmax


# ---------------------------------------------------------------------------
# MXU path: cost = |f1|^2 + |f2|^2 - 2 <f1, f2>, cross terms as batched
# matmuls on the systolic array with a pad-reshape band extraction
# ---------------------------------------------------------------------------

def _band_from_gram(G: jnp.ndarray, maxw: int) -> jnp.ndarray:
    """G: (..., W, W2) gram matrix, W2 >= W + maxw - 1. Returns
    (..., W, maxw) with band[..., x, dx] = G[..., x, x + dx].

    The trick: flat row-major index of (x, x+dx) is x*W2 + x + dx =
    x*(W2+1) + dx, so padding the flattened matrix and re-viewing it with
    row stride W2+1 turns the diagonal band into leading columns — pure
    layout ops, no gather."""
    *lead, W, W2 = G.shape
    flat = G.reshape(*lead, W * W2)
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, W)])
    view = flat.reshape(*lead, W, W2 + 1)
    return view[..., :maxw]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def match_flow_mxu(
    f1: jnp.ndarray, f2: jnp.ndarray, maxh: int, maxw: int,
    block_rows: int = 8, dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MXU variant of match_flow_fused: same (idx, ey, ex, pmax) contract.

    For each row-block and each dy, the cross-correlation against all dx
    shifts is ONE batched matmul (rows x K x shifted rows) on the MXU,
    followed by the band extraction above; norms and softmax/WTA decode are
    cheap VPU epilogues. Accepts (H, W, K) or (B, H, W, K). ``dtype``
    controls the matmul precision (bf16 ~4x f32 MXU throughput; costs are
    accumulated in f32)."""
    squeeze = f1.ndim == 3
    if squeeze:
        f1, f2 = f1[None], f2[None]
    B, H, W, K = f1.shape
    H2, W2 = f2.shape[1], f2.shape[2]
    assert H2 == H + maxh - 1 and W2 == W + maxw - 1

    mid = (math.ceil(maxh / 2) - 1) * maxw + (math.ceil(maxw / 2) - 1)
    halfh1 = math.ceil(maxh / 2) - 1
    halfw1 = math.ceil(maxw / 2) - 1
    off = jnp.arange(maxh * maxw, dtype=jnp.float32)
    off_y = off // maxw - halfh1
    off_x = off % maxw - halfw1

    n1 = jnp.sum(f1.astype(jnp.float32) ** 2, axis=-1)        # (B, H, W)
    n2 = jnp.sum(f2.astype(jnp.float32) ** 2, axis=-1)        # (B, H2, W2)
    f1c = f1.astype(dtype)
    f2c = f2.astype(dtype)

    tb = block_rows
    n_blocks = -(-H // tb)
    pad = n_blocks * tb - H
    if pad:
        f1c = jnp.pad(f1c, ((0, 0), (0, pad), (0, 0), (0, 0)))
        n1 = jnp.pad(n1, ((0, 0), (0, pad), (0, 0)))
        f2c = jnp.pad(f2c, ((0, 0), (0, pad), (0, 0), (0, 0)))
        n2 = jnp.pad(n2, ((0, 0), (0, pad), (0, 0)))

    def block(i):
        a = jax.lax.dynamic_slice(
            f1c, (0, i * tb, 0, 0), (B, tb, W, K))            # (B, t, W, K)
        na = jax.lax.dynamic_slice(n1, (0, i * tb, 0), (B, tb, W))
        costs = []
        for dy in range(maxh):
            b = jax.lax.dynamic_slice(
                f2c, (0, i * tb + dy, 0, 0), (B, tb, W2, K))
            nb = jax.lax.dynamic_slice(n2, (0, i * tb + dy, 0), (B, tb, W2))
            G = jnp.einsum("btwk,btvk->btwv", a, b,
                           preferred_element_type=jnp.float32)
            band = _band_from_gram(G, maxw)                   # (B, t, W, maxw)
            nb_band = jnp.stack(
                [jax.lax.slice_in_dim(nb, dx, dx + W, axis=-1)
                 for dx in range(maxw)], axis=-1)             # nb[x + dx]
            costs.append(na[..., None] + nb_band - 2.0 * band)
        c = jnp.concatenate(costs, axis=-1)                   # (B, t, W, D)
        # decode epilogue (same contract as the fused kernel)
        best = jnp.argmax(-c, axis=-1).astype(jnp.int32)
        cmin = jnp.min(c, axis=-1)
        tie = c[..., mid] <= cmin
        idx = jnp.where(tie, mid, best)
        p = jax.nn.softmax(-c, axis=-1)
        ey = jnp.einsum("btwd,d->btw", p, off_y)
        ex = jnp.einsum("btwd,d->btw", p, off_x)
        pmax = jnp.max(p, axis=-1)
        return idx, ey, ex, pmax

    idx, ey, ex, pmax = jax.lax.map(block, jnp.arange(n_blocks))
    # (n_blocks, B, tb, W) -> (B, H, W)
    def fix(a):
        a = jnp.moveaxis(a, 0, 1).reshape(B, n_blocks * tb, W)
        return a[:, :H]
    idx, ey, ex, pmax = fix(idx), fix(ey), fix(ex), fix(pmax)
    if squeeze:
        idx, ey, ex, pmax = (a[0] for a in (idx, ey, ex, pmax))
    return idx, ey, ex, pmax
