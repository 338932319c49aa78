"""Shape-keyed autotuning for the Pallas matcher block size.

``block_rows`` is a pure blocking factor — outputs are identical for any
value (pinned by tests/test_matching.py) — but the fastest value depends on
shape, dtype, and batch (measured on v5e at the headline shape: 0.240 ms
at 8, 0.229 at 32, 0.306 at 48; 64 exceeds scoped VMEM at B=128). Rather
than hard-coding per-call-site constants, ``best_block_rows`` measures the
candidates ONCE per (kernel, shapes, dtype, backend) on the live device and
persists the winner next to the compilation cache (.jax_cache/autotune.json),
so every later process — and every later run of the same pipeline — starts
tuned. With the persistent compile cache the one-time candidate sweep is
also the only time those variants are ever compiled.

This is an EXPLICIT pre-pass: resolve the block size before building a
jitted program (e.g. ``BatchedDepthEstimator(match_block="auto")`` resolves
during ``reset()``, where the real feature shapes exist). Kernels themselves
never see "auto" — timing under a tracer is meaningless.
"""

from __future__ import annotations

import json
import os
import time

CANDIDATES = (8, 16, 32, 48)

# Bump when a matcher kernel changes in a way that can shift the fastest
# block size: the persisted winners must be invalidated explicitly (the
# compile cache invalidates itself on code changes; this store does not).
TUNE_VERSION = 2

_cache = None
# winners from partial/failed sweeps: process-local only, never persisted
_session_only: dict = {}


def _store_path():
    from ..utils.compcache import DEFAULT_DIR
    d = os.environ.get("DE_TPU_COMPILE_CACHE", DEFAULT_DIR)
    if d in ("", "0", "off"):
        return None
    return os.path.join(d, "autotune.json")


def _load() -> dict:
    global _cache
    if _cache is None:
        _cache = {}
        p = _store_path()
        if p and os.path.exists(p):
            try:
                with open(p) as fh:
                    _cache = json.load(fh)
            except Exception:
                _cache = {}
    return _cache


def _save() -> None:
    p = _store_path()
    if p is None:
        return
    try:
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as fh:
            json.dump(_cache, fh, indent=1, sort_keys=True)
    except Exception:
        pass


def _default_timer(fn, n: int = 5) -> float:
    """Amortized seconds/call, fetch-synced with RTT subtraction (the
    tunneled-backend rule, bench.py)."""
    import jax
    import jax.numpy as jnp
    out = fn()
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(1.0)))
    t0 = time.perf_counter()
    float(nop(jnp.float32(2.0)))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


def pick(key: str, run_candidate, candidates=CANDIDATES, timer=None) -> int:
    """Return the cached winner for ``key``, measuring each candidate via
    ``run_candidate(c)`` on a miss. Candidates that raise (e.g. exceed
    scoped VMEM) are skipped — but a sweep with ANY failure (a transient
    tunnel error is indistinguishable from a deterministic resource limit)
    is only cached in-process, never persisted: a winner written to disk
    must come from a complete sweep."""
    cache = _load()
    if key in cache:
        return int(cache[key])
    if key in _session_only:
        return int(_session_only[key])
    timer = timer or _default_timer
    best, best_t, failed = None, float("inf"), 0
    for c in candidates:
        try:
            t = timer(lambda: run_candidate(c))
        except Exception:
            failed += 1
            continue
        if t < best_t:
            best, best_t = c, t
    if best is None:
        # nothing measured at all: fall back for this process only
        best = candidates[0]
    if failed:
        _session_only[key] = int(best)
        return int(best)
    cache[key] = int(best)
    _save()
    return int(best)


def best_block_rows(kernel: str, f1_shape, f2_shape, maxh: int, maxw: int,
                    dtype=None, want_conf: bool = False,
                    conf_threshold: float = 0.11,
                    candidates=CANDIDATES, timer=None) -> int:
    """Resolve the fastest ``block_rows`` for a matcher call signature by
    measuring on the live device (cached persistently). ``kernel`` is
    'fused' or 'fast'; shapes are the concrete (B?, H, W, K) feature
    shapes the pipeline will pass."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from . import matching
    assert kernel in ("fused", "fast")
    dtype = dtype or jnp.float32
    dname = jnp.dtype(dtype).name
    key = (f"v{TUNE_VERSION}:jax{jax.__version__}:"
           f"{kernel}:{jax.default_backend()}:{tuple(f1_shape)}:"
           f"{tuple(f2_shape)}:{maxh}x{maxw}:{dname}:"
           f"conf={int(want_conf)}")
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.rand(*f1_shape), jnp.float32)
    f2 = jnp.asarray(rng.rand(*f2_shape), jnp.float32)

    def run(c):
        if kernel == "fast":
            return matching.match_flow_fast(f1, f2, maxh, maxw, c, False,
                                            dtype)
        return matching.match_flow_fused(f1, f2, maxh, maxw, c, False,
                                         False, dtype, want_conf,
                                         conf_threshold)

    return pick(key, run, candidates, timer)
