"""Conv feature extractor ("filter") — the siamese trunk of every matcher.

Rebuilds getFilter (/root/reference/opticalflow_model.lua:45-79): a stack of
VALID convolutions with Tanh between layers (none after the last). The
reference uses nn.SpatialConvolutionMap with a random sparse connection table
when consecutive layer channel counts don't chain
(/root/reference/opticalflow_model.lua:56-59); sparse random connectivity is
an anti-pattern on the MXU (it was a 2012 FLOP-saving trick), so we use dense
convolutions — a strict superset in capacity — and keep the layer-spec format.

Layout is NHWC (TPU-native). Weights are named ``layer1..layerN`` to mirror
the reference's named-weights checkpoint payload
(/root/reference/opticalflow_model.lua:66-76).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..geometry import Geometry


class ConvFilter(nn.Module):
    """Feature trunk: geometry.layers = ((cin, kh, kw, cout), ...)."""

    geometry: Geometry

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        layers = self.geometry.layers
        for i, (cin, kh, kw, cout) in enumerate(layers):
            x = nn.Conv(
                features=cout,
                kernel_size=(kh, kw),
                padding="VALID",
                name=f"layer{i + 1}",
                dtype=x.dtype,
            )(x)
            if i != len(layers) - 1:
                x = nn.tanh(x)
        return x


def identity_filter_params(geometry: Geometry, dtype=jnp.float32):
    """Build ConvFilter params whose output features are the raw input patch
    vectorized — the reference's analytic-test trick
    (/root/reference/tests/test_patches2.lua:44-54): with these weights,
    feature-space SSD equals raw-pixel patch SSD, so matching is decidable by
    brute force. Requires a single layer with cout == kh*kw*cin."""
    assert len(geometry.layers) == 1
    cin, kh, kw, cout = geometry.layers[0]
    assert cout == kh * kw * cin, "identity filter needs cout == kh*kw*cin"
    # flax Conv kernel shape: (kh, kw, cin, cout)
    kernel = jnp.zeros((kh, kw, cin, cout), dtype)
    for i in range(kh):
        for j in range(kw):
            for k in range(cin):
                out_idx = (i * kw + j) * cin + k
                kernel = kernel.at[i, j, k, out_idx].set(1.0)
    bias = jnp.zeros((cout,), dtype)
    return {"params": {"layer1": {"kernel": kernel, "bias": bias}}}
