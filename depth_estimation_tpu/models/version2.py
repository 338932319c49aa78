"""version2 network — the simplified rewrite generation.

Rebuilds /root/reference/version2/network.lua: contrastive normalization ->
single 17x17 conv (32 features, siamese shared) -> 17x17 SpatialMatching;
the trainer head adds Reshape -> Minus -> LogSoftMax (:41-47). The reference
pads frame 1 *negatively* (crops) by the asymmetric window halves before the
conv so matching is centered — identical to crop_features_center.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry import Geometry
from ..ops import matching
from ..ops.normalization import spatial_contrastive_normalization
from .filters import ConvFilter
from .flow import crop_features_center


@dataclasses.dataclass(frozen=True)
class V2Params:
    """The datap table of /root/reference/version2/train.lua:11-29."""
    wImg: int = 320
    hImg: int = 180
    normalization_k: int = 17
    layers: Tuple[Tuple[int, int, int, int], ...] = ((3, 17, 17, 32),)
    hWin: int = 17
    wWin: int = 17

    def geometry(self) -> Geometry:
        return Geometry(hImg=self.hImg, wImg=self.wImg, layers=self.layers,
                        maxh=self.hWin, maxw=self.wWin,
                        maxhGT=self.hWin, maxwGT=self.wWin,
                        hKernelGT=self.layers[0][1], wKernelGT=self.layers[0][2])


class V2Network:
    def __init__(self, datap: V2Params = V2Params()):
        self.datap = datap
        self.geometry = datap.geometry()
        self.filter = ConvFilter(self.geometry)

    def init(self, rng):
        g = self.geometry
        dummy = jnp.zeros((g.hPatch2, g.wPatch2, g.in_channels), jnp.float32)
        return self.filter.init(rng, dummy)

    def costs(self, params, img1, img2) -> jnp.ndarray:
        g = self.geometry
        n1 = spatial_contrastive_normalization(img1, self.datap.normalization_k)
        n2 = spatial_contrastive_normalization(img2, self.datap.normalization_k)
        f1 = crop_features_center(g, self.filter.apply(params, n1))
        f2 = self.filter.apply(params, n2)
        return matching.match_ssd(f1, f2, g.maxh, g.maxw)

    def log_scores(self, params, img1, img2) -> jnp.ndarray:
        """Trainer head (getTrainerNetwork, version2/network.lua:41-47)."""
        return jax.nn.log_softmax(-self.costs(params, img1, img2), axis=-1)
