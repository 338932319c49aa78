"""Banded bilinear warp as a VMEM-resident Pallas kernel.

The rotation-compensation warp of the online pipeline
(sfm2.removeEgoMotion, /root/reference/depth_estimation_api.lua:147) has a
bounded displacement on every frame the pipeline keeps: |warp(p) - p| must
stay within the matcher's search margin or the correspondence falls outside
the window anyway. That bound turns the 4-tap bilinear gather into a sum
over STATIC shifts of the zero-padded image weighted by the bilinear hat:

    out[y, x] = sum_{s,t in [-D, D+1]} hat(sy - y - s) * hat(sx - x - t)
                                       * img[y + s, x + t]

(geometry3d/undistort.remove_ego_motion_banded is the XLA form). The XLA
lowering of that loop measures ~0.35 TFLOP/s on a v5e — far under the VPU
roofline; reduced-precision storage does not move it (not bandwidth-bound),
so the residual is fusion/materialization overhead between the 324 terms.
This kernel runs the same static unroll VMEM-resident per row-block: one
DMA of the (C, TH + 2(D+1), W + 2(D+1)) slab, lane shifts hoisted to the
outer loop (one lane rotation per t, like the matcher's dx-outer rule),
all accumulation in registers/VMEM. Output is bit-identical math to the
XLA form (same shift/weight expressions, f32 accumulation).

Layout: channels-first inside the kernel (spatial dims on sublanes/lanes,
C as the leading repeat dim — K is small), channels-last at the boundary,
matching ops/matching.py's convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(dyf_ref, dxf_ref, img_ref, out_ref, *, band: int,
                   th: int, W: int, slab_rows: int, Wp: int, C: int):
    """One grid step warps a (C, TH, W) row-block of the output.

    dyf/dxf: (TH, W) VMEM — sample-coordinate minus output-coordinate
             (the displacement field) for this block.
    img_ref: (C, Hp, Wp) HBM/ANY — the zero-padded source; each program
             DMAs its own overlapping (C, slab_rows, Wp) slab.
    """
    D = band
    P = D + 1
    dyf = dyf_ref[0]
    dxf = dxf_ref[0]
    b = pl.program_id(0)
    i = pl.program_id(1)

    # per-s hat weights, hoisted out of the t loop
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dyf - (k - D)))
           for k in range(2 * P)]

    def body(slab, sem):
        dma = pltpu.make_async_copy(
            img_ref.at[b, :, pl.ds(pl.multiple_of(i * th, 8), slab_rows), :],
            slab, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((C, th, W), jnp.float32)
        # t (lane shift) outer — one lane rotation per t, 2P total, with
        # the cheap sublane shifts inside (the matcher's dx-outer rule)
        for t in range(2 * P):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxf - (t - D)))
            cols = jax.lax.slice(slab[...], (0, 0, t + 1),
                                 (C, slab_rows, t + 1 + W))
            for k in range(2 * P):
                w = (wys[k] * wx)[None]
                sl = jax.lax.slice(cols, (0, k + 1, 0), (C, k + 1 + th, W))
                acc = acc + w * sl.astype(jnp.float32)
        out_ref[...] = acc[None]

    pl.run_scoped(
        body,
        pltpu.VMEM((C, slab_rows, Wp), img_ref.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def banded_bilinear_warp(imgs: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                         band: int = 8, block_rows: int = 16,
                         interpret: bool = False) -> jnp.ndarray:
    """Bilinear-sample ``imgs`` at (ys, xs), exact wherever the sample
    displacement |(ys, xs) - (y, x)| <= ``band`` (both axes); pixels whose
    displacement exceeds the band read the band-clipped partial sum and
    MUST be masked by the caller (undistort.ego_motion_valid_mask(...,
    band=band) for the homography warp). Out-of-image samples read zeros
    (matching bilinear_sample's zero border).

    imgs (B, H, W, C) channels-last; xs, ys (B, H, W). Returns
    (B, H, W, C) f32.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    B, H, W, C = imgs.shape
    D = band
    P = D + 1

    jj = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ii = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    dyf = (ys - ii).astype(jnp.float32)
    dxf = (xs - jj).astype(jnp.float32)

    imgt = jnp.transpose(imgs, (0, 3, 1, 2))             # (B, C, H, W)
    # DMA'd slabs must be lane-(128-)aligned: round the padded width up
    Wp = -(-(W + 2 * P) // 128) * 128
    imgt = jnp.pad(imgt, ((0, 0), (0, 0), (P, P), (P, Wp - W - P)))
    Hp = H + 2 * P

    th = max(8, (min(block_rows, H) // 8) * 8)
    n_blocks = pl.cdiv(H, th)
    # slab covers padded rows [i*th, i*th + th + 2P), rounded to sublanes
    slab_rows = -(-(th + 2 * P) // 8) * 8
    rows_needed = (n_blocks - 1) * th + slab_rows
    pad_out = n_blocks * th - H
    pad_in = rows_needed - Hp
    if pad_in > 0:
        imgt = jnp.pad(imgt, ((0, 0), (0, 0), (0, pad_in), (0, 0)))
    if pad_out > 0:
        dyf = jnp.pad(dyf, ((0, 0), (0, pad_out), (0, 0)),
                      constant_values=1e6)               # hat -> 0: no reads
        dxf = jnp.pad(dxf, ((0, 0), (0, pad_out), (0, 0)),
                      constant_values=1e6)

    kernel = functools.partial(_banded_kernel, band=band, th=th, W=W,
                               slab_rows=slab_rows, Wp=Wp, C=C)
    grid_spec = pl.GridSpec(
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, th, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # img stays in HBM; DMA slabs
        ],
        out_specs=pl.BlockSpec((1, C, th, W), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C, n_blocks * th, W),
                                       jnp.float32),
        grid_spec=grid_spec, interpret=interpret,
        # the unrolled 2P x 2P shift-sum holds more live slices than the
        # default 16M scoped-vmem budget; v5e has 128M physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(dyf, dxf, imgt)
    if pad_out > 0:
        out = out[:, :, :H]
    return jnp.transpose(out, (0, 2, 3, 1))
