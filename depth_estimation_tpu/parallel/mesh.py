"""Device-mesh parallelism: batch data-parallel over ICI.

The reference has no distributed execution at all (SURVEY.md §2.5) — its only
compute parallelism is an OpenMP thread pool
(/root/reference/opticalflow.lua:118). The TPU-native equivalent: flow
inference is embarrassingly parallel per frame-pair, so we shard the
frame/patch batch across a 1-D ``dp`` mesh axis with ``NamedSharding`` and
let XLA insert the (only needed) collectives — an all-reduce of gradients in
training, nothing at all in inference. The model is tiny (KBs of conv
weights), so parameters are replicated; tensor/pipeline sharding would only
add ICI traffic for this workload and is deliberately not used.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "dp") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(x, mesh: Mesh, axis: str = "dp"):
    """Place a batched pytree with the leading axis split across the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def replicate(x, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def pad_to_multiple(x: np.ndarray, m: int):
    """Pad the leading axis to a multiple of m (static shapes for pjit)."""
    n = x.shape[0]
    pad = (-n) % m
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
    return x, n


def sharded_train_step(trainer, mesh: Mesh, axis: str = "dp"):
    """Wrap a Trainer's jitted step with explicit shardings: batch split on
    ``dp``, params/opt state replicated. XLA derives the gradient psum."""
    batch_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    step = jax.jit(
        trainer._step_fn,
        in_shardings=(rep, batch_sh, batch_sh, batch_sh, batch_sh),
        out_shardings=(rep, rep),
    )
    return step


def spatial_sharded_flow_fn(model, mesh: Mesh, axis: str = "sp"):
    """Context-parallel analog for correlation workloads (SURVEY.md §5): ONE
    frame pair is split across devices along image rows; each device pulls
    the halo rows its matcher window + conv footprint need from its
    neighbor below via ppermute, computes its slice of features + matching
    locally, and the row-sharded outputs concatenate to the full-frame
    result. The last shard's missing halo arrives as ppermute zeros —
    identical to running the unsharded model on a zero-bottom-padded frame.

    Returns fn(params, img1 (H, W, C), img2) -> (idx, ey, ex, pmax) with
    H = n_devices * rows_per_shard (pad the frame to a multiple first).
    """
    g = model.geometry
    n = mesh.devices.size
    halo = (g.maxh - 1) + (g.hKernel - 1)
    perm = [(i + 1, i) for i in range(n - 1)]   # pull rows from below

    def local(params, s1, s2):
        # s1, s2: (Hs, W, C) local row shards
        h1 = jax.lax.ppermute(s1[:halo], axis, perm)
        h2 = jax.lax.ppermute(s2[:halo], axis, perm)
        e1 = jnp.concatenate([s1, h1], axis=0)
        e2 = jnp.concatenate([s2, h2], axis=0)
        from ..models.flow import crop_features_center
        from ..ops import matching
        f1full = model.features(params, e1)
        f2 = model.features(params, e2)
        # crop f1 left/right by the half-window; rows start at halfh1 like
        # the unsharded path, keeping Hs output rows per shard
        f1 = f1full[g.halfh1:g.halfh1 + s1.shape[0],
                    g.halfw1:f1full.shape[1] - g.halfw2, :]
        f2 = f2[:s1.shape[0] + g.maxh - 1]
        return matching.match_flow_fused(f1, f2, g.maxh, g.maxw)

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_flow_fn(model, mesh: Mesh, axis: str = "dp"):
    """Batched flow inference sharded over the mesh: (B, H, W, C) pairs ->
    per-pair decoded flow, B split across devices. Uses shard_map so each
    device runs its own Pallas matcher on its local shard (the kernel is a
    per-pair program; no cross-device communication exists in this op)."""

    def local_forward(params, img1, img2):
        # forward_fused is natively batched (batch = Pallas grid dim)
        return model.forward_fused(params, img1, img2)

    mapped = jax.shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,   # Pallas outputs carry no vma metadata
    )
    return jax.jit(mapped)
