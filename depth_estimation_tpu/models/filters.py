"""Conv feature extractor ("filter") — the siamese trunk of every matcher.

Rebuilds getFilter (/root/reference/opticalflow_model.lua:45-79): a stack of
VALID convolutions with Tanh between layers (none after the last). The
reference uses nn.SpatialConvolutionMap with a random sparse connection table
when consecutive layer channel counts don't chain
(/root/reference/opticalflow_model.lua:56-59), reproduced here by
SparseConvMap: the reference's sparse parameter count, scattered into a
dense kernel at apply time so the conv still runs dense on the MXU.

Layout is NHWC (TPU-native). Weights are named ``layer1..layerN`` to mirror
the reference's named-weights checkpoint payload
(/root/reference/opticalflow_model.lua:66-76).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import Geometry
from ..ops.s2d_conv import pick_s2d_factor, s2d_conv


class TrunkConv(nn.Module):
    """nn.Conv-compatible VALID conv that dispatches to the width-folded
    (space-to-depth) form when the output-channel count underfills the
    MXU lanes — the direct conv measured ~10% of the chip ceiling at the
    trunk's 3->10 shapes (ops/s2d_conv.py has the full story and
    benchmarks/bench_trunk_variants.py the measurements). Param names,
    shapes, and initializers match nn.Conv exactly, so checkpoints are
    interchangeable and existing models load unchanged."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        s = pick_s2d_factor(kh, kw, cin, self.features)
        y = s2d_conv(x, kernel.astype(x.dtype), s)
        return y + bias.astype(y.dtype)


def random_connection_table(nin: int, nout: int, nto: int,
                            seed: int = 0) -> np.ndarray:
    """(nout, nto) int table: each output channel's nto distinct input
    channels — the clean-room equivalent of nn.tables.random(nin, nout,
    nto). Fixed seed so the topology is part of the architecture (the
    reference freezes its table at module construction)."""
    rng = np.random.RandomState(seed)
    return np.stack([rng.choice(nin, size=nto, replace=False)
                     for _ in range(nout)])


class SparseConvMap(nn.Module):
    """nn.SpatialConvolutionMap(nn.tables.random(nin, nout, nto))
    (/root/reference/opticalflow_model.lua:56-59): each output map reads a
    fixed random subset of nto input channels. Parameters are exactly the
    sparse (kh, kw, nto, nout) kernel (reference parameter count); at apply
    time it is scattered into a dense (kh, kw, nin, nout) kernel so the
    conv still runs dense on the MXU — sparse-random connectivity was a
    2012 FLOP-saving trick, not something a systolic array wants."""

    nin: int
    nout: int
    nto: int
    kh: int
    kw: int
    seed: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = random_connection_table(self.nin, self.nout, self.nto,
                                        self.seed)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3, "fan_in", "uniform",
                                             in_axis=(0, 1, 2)),
            (self.kh, self.kw, self.nto, self.nout))
        bias = self.param("bias", nn.initializers.zeros, (self.nout,))
        # scatter sparse -> dense: one-hot (nout, nto, nin) selection
        onehot = np.zeros((self.nout, self.nto, self.nin), np.float32)
        for o in range(self.nout):
            for j in range(self.nto):
                onehot[o, j, table[o, j]] = 1.0
        dense = jnp.einsum("hwjo,ojn->hwno", kernel.astype(jnp.float32),
                           jnp.asarray(onehot)).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x[None] if x.ndim == 3 else x, dense,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bias.astype(y.dtype)
        return y[0] if x.ndim == 3 else y


class ConvFilter(nn.Module):
    """Feature trunk: geometry.layers = ((cin, kh, kw, cout), ...).

    When a layer's nominal cin differs from the previous layer's cout, the
    reference builds a sparse random connection table with fan-in cin over
    the actual prev_cout channels (getFilter,
    /root/reference/opticalflow_model.lua:53-59; the trainer's -s2c/-s3c
    flags feed that first element) — reproduced here by SparseConvMap."""

    geometry: Geometry

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        layers = self.geometry.layers
        for i, (cin, kh, kw, cout) in enumerate(layers):
            prev_cout = layers[i - 1][3] if i > 0 else cin
            if i > 0 and prev_cout != cin:
                x = SparseConvMap(
                    nin=prev_cout, nout=cout, nto=cin, kh=kh, kw=kw,
                    name=f"layer{i + 1}")(x)
            else:
                x = TrunkConv(
                    features=cout,
                    kernel_size=(kh, kw),
                    name=f"layer{i + 1}",
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
