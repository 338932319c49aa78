"""Confidence extraction over per-pixel window distributions.

TPU rebuild of extract_output.cpp (/root/reference/extract_output.cpp:63-155):
the reference scans each pixel's distribution, collects up to 4 (threshold
>= 0.2) or 8 values above the threshold with hand-rolled sorting networks,
returns the argmax index and a rank-weighted score
``sum_k (K - k) * v_sorted[k]``. Here that whole routine is
``jax.lax.top_k`` + a weighted sum — vectorized over all pixels at once.

Deviations (documented, both strictly saner):
  * the reference keeps the first-in-scan-order K entries above threshold;
    we keep the K *largest* (identical unless more than K entries exceed the
    threshold, which for softmax outputs and threshold 0.11 requires K > 9).
  * pixels with no value above the threshold have undefined idx/score in the
    reference (uninitialized memory); we return the argmax and score 0.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def extract_output(
    dist: jnp.ndarray, threshold: float = 0.11, max_highs: int | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Args: dist (..., D) per-pixel distribution (softmax scores).
    Returns (idx, score): argmax flat index (int32) and rank-weighted
    accumulated score, 0 where nothing clears the threshold."""
    if max_highs is None:
        max_highs = 8 if threshold < 0.2 else 4
    k_eff = min(max_highs, dist.shape[-1])
    vals, _ = jax.lax.top_k(dist, k_eff)
    vals = jnp.where(vals > threshold, vals, 0.0)
    # rank weights start at max_highs even when D < max_highs (the reference
    # always uses a buffer of max_highs slots, zero-filled)
    weights = jnp.arange(max_highs, max_highs - k_eff, -1, dtype=dist.dtype)
    score = jnp.einsum("...k,k->...", vals, weights)
    idx = jnp.argmax(dist, axis=-1).astype(jnp.int32)
    return idx, score


def middle_disc_mask(h: int, w: int, radius: float = 25.0,
                     feather: float = 0.0) -> jnp.ndarray:
    """Mask out a disc around the image center (where forward-motion flow
    vanishes and carries no depth signal) with optional linear feathering —
    the maskmiddle of the offline video pipeline
    (/root/reference/test_opticalflow.lua:259-273)."""
    ii = jnp.arange(h, dtype=jnp.float32)[:, None] - h / 2
    jj = jnp.arange(w, dtype=jnp.float32)[None, :] - w / 2
    d = jnp.sqrt(ii * ii + jj * jj)
    if feather > 0:
        return jnp.clip((d - radius) / feather, 0.0, 1.0)
    return (d >= radius).astype(jnp.float32)


def entropy_mask(dist: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Uncertainty gating: mask out pixels whose window distribution has
    entropy above threshold (the entropy mask of the offline video pipeline,
    /root/reference/test_opticalflow.lua:259-273). dist: (..., D) softmax
    scores. Returns bool (...,)."""
    p = jnp.clip(dist, 1e-12, 1.0)
    h = -jnp.sum(p * jnp.log(p), axis=-1)
    return h <= threshold


def enlarge_mask(mask: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """Shrink a validity mask by the matcher footprint: a pixel stays valid
    only if the whole (kh, kw) window around it is valid — min-pool, the
    morphological erosion the reference implements in inline C as enlargeMask
    (/root/reference/depth_estimation_api.lua:76-132)."""
    m = mask.astype(jnp.float32)
    # out-of-frame is invalid: zero-pad, then VALID min-pool
    m = jnp.pad(m, ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)))
    eroded = jax.lax.reduce_window(
        m, 1.0, jax.lax.min,
        window_dimensions=(kh, kw),
        window_strides=(1, 1),
        padding="VALID",
    )
    return eroded > 0.5
