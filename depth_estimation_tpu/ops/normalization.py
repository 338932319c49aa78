"""Local contrastive normalization — nn.SpatialContrastiveNormalization.

The version2 network normalizes its inputs with a gaussian-windowed
subtractive + divisive normalization
(/root/reference/version2/network.lua:12 with image.gaussian1D(k)).
Torch semantics reproduced: a separable gaussian kernel normalized over
kernel-sum * nChannels computes a cross-channel local mean (subtracted) and
local std (divided, floored by its spatial mean), with border renormalization
by the convolved coefficient map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian1d(k: int, sigma: float = 0.25) -> np.ndarray:
    """torch image.gaussian1D: size k, sigma relative to size, amplitude 1,
    centered."""
    x = np.arange(k, dtype=np.float64)
    center = (k - 1) / 2
    g = np.exp(-((x - center) / (sigma * k)) ** 2 / 2)
    return g.astype(np.float32)


def _sep_conv_same(x: jnp.ndarray, f: np.ndarray) -> jnp.ndarray:
    """Separable 'same' correlation with zero padding; x: (H, W)."""
    r = len(f) // 2
    xp = jnp.pad(x, ((r, r), (0, 0)))
    out = jnp.zeros_like(x)
    for i, w in enumerate(f):
        out = out + w * jax.lax.slice_in_dim(xp, i, i + x.shape[0], axis=0)
    xp = jnp.pad(out, ((0, 0), (r, r)))
    out2 = jnp.zeros_like(x)
    for i, w in enumerate(f):
        out2 = out2 + w * jax.lax.slice_in_dim(xp, i, i + x.shape[1], axis=1)
    return out2


@functools.partial(jax.jit, static_argnums=(1,))
def spatial_contrastive_normalization(img: jnp.ndarray, k: int = 17) -> jnp.ndarray:
    """img: (H, W, C) -> same shape. Gaussian window of size k."""
    f = gaussian1d(k)
    C = img.shape[2]
    f = f / (f.sum() * C)          # torch kernel normalization
    ones = jnp.ones(img.shape[:2], img.dtype)
    coef = _sep_conv_same(ones, f) * C   # border renormalization map

    local_sum = sum(_sep_conv_same(img[..., c], f) for c in range(C))
    local_mean = local_sum / jnp.maximum(coef, 1e-8)
    v = img - local_mean[..., None]

    local_var = sum(_sep_conv_same(v[..., c] ** 2, f) for c in range(C))
    local_std = jnp.sqrt(jnp.maximum(local_var / jnp.maximum(coef, 1e-8), 0.0))
    thresh = jnp.maximum(local_std, jnp.mean(local_std))
    thresh = jnp.maximum(thresh, 1e-4)
    return v / thresh[..., None]
