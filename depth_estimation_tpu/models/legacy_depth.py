"""Legacy direct depth models — the repo's original approach
(superseded by flow matching, kept for capability parity).

Rebuilds the two networks of /root/reference/depth_estimation.lua:88-143:
  * 'opticalflow' variant: siamese 16x16 conv + Tanh on a 2-frame patch
    stack, SpatialMatching window head (:90-121);
  * the classic CNN: subtractive normalization -> conv(50, 5x5) -> tanh ->
    maxpool -> norm -> conv(128, 5x5) -> tanh -> maxpool -> conv(200, 5x5)
    -> tanh -> per-pixel linear classifier over depth classes (:122-140).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import matching
from ..ops.normalization import gaussian1d, _sep_conv_same


def subtractive_normalization(img: jnp.ndarray, k: int = 15) -> jnp.ndarray:
    """nn.SpatialSubtractiveNormalization with gaussian1D(k).
    img: (H, W, C) or batched (B, H, W, C)."""
    if img.ndim == 4:
        return jax.vmap(lambda x: subtractive_normalization(x, k))(img)
    f = gaussian1d(k)
    C = img.shape[-1]
    f = f / (f.sum() * C)
    ones = jnp.ones(img.shape[:2], img.dtype)
    coef = _sep_conv_same(ones, f) * C
    local_sum = sum(_sep_conv_same(img[..., c], f) for c in range(C))
    return img - (local_sum / jnp.maximum(coef, 1e-8))[..., None]


class DepthClassifierCNN(nn.Module):
    """Patch (2-frame stack) -> per-pixel depth-class logits."""

    n_classes: int
    in_channels: int = 2    # frame pair stacked on channels

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = subtractive_normalization(x, 15)
        x = nn.tanh(nn.Conv(50, (5, 5), padding="VALID", name="conv1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = subtractive_normalization(x, 15)
        # dense conv replaces SpatialConvolutionMap(random(50,128,10))
        x = nn.tanh(nn.Conv(128, (5, 5), padding="VALID", name="conv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.tanh(nn.Conv(200, (5, 5), padding="VALID", name="conv3")(x))
        # SpatialClassifier: shared linear over every spatial position
        x = nn.Dense(self.n_classes, name="classifier")(x)
        return x


class LegacyFlowModel:
    """The 'opticalflow' network variant: shared 16x16 conv + matching."""

    def __init__(self, maxh: int = 16, maxw: int = 16, kernel: int = 16,
                 n_features: int = 10):
        self.maxh, self.maxw = maxh, maxw
        self.kernel = kernel
        self.conv = nn.Conv(n_features, (kernel, kernel), padding="VALID",
                            name="conv")

    def init(self, rng, h: int = 48, w: int = 48):
        return self.conv.init(rng, jnp.zeros((h, w, 1), jnp.float32))

    def costs(self, params, patch1: jnp.ndarray, patch2: jnp.ndarray):
        import math
        h1 = math.ceil(self.maxh / 2) - 1
        w1 = math.ceil(self.maxw / 2) - 1
        p1 = patch1[h1:patch1.shape[0] - self.maxh // 2,
                    w1:patch1.shape[1] - self.maxw // 2]
        f1 = jnp.tanh(self.conv.apply(params, p1))
        f2 = jnp.tanh(self.conv.apply(params, patch2))
        return matching.match_ssd(f1, f2, self.maxh, self.maxw)
