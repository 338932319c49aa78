"""Persistent XLA compilation cache shared by every entry point.

Compiles are the dominant fixed cost in this environment: first-compiles on
the tunneled TPU backend run 20-120 s (sometimes minutes, CLAUDE.md), and the
CPU test mesh pays multi-minute XLA compiles for the large interpret-mode
Pallas programs (jit_match_flow_fast alone is ~7.5 min). All of that is pure
recomputation whenever code, shapes, and jax version are unchanged — exactly
what jax's persistent compilation cache deduplicates. Enabling it here (the
package ``__init__`` calls :func:`enable_persistent_cache` on import, see
below) makes every process — pytest, bench.py, the benchmark harnesses, the
CLIs, the driver's end-of-round bench run — reuse executables compiled by any
earlier process.

Knobs (environment):
  DE_TPU_COMPILE_CACHE       cache directory; ``0``/``off`` disables; default
                             ``<repo>/.jax_cache`` (gitignored).
  DE_TPU_COMPILE_CACHE_MIN   minimum compile seconds for an entry to be
                             persisted (default 2.0 — keeps the thousands of
                             trivial sub-second test programs out).

Note on CPU cache loads: XLA's CPU AOT loader logs two spurious ERROR lines
per cached load ("+prefer-no-scatter is not supported on the host machine")
— the mismatch is in XLA-internal pseudo-features, not real ISA features;
same-machine loads are safe. tests/conftest.py defaults TF_CPP_MIN_LOG_LEVEL
to 3 to keep the suite output readable.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEFAULT_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_seconds: float | None = None):
    """Point jax's persistent compilation cache at ``cache_dir``.

    Safe to call at any time before (or between) compiles; never raises —
    a backend/plugin that cannot serialize executables just compiles as
    before (jax skips the cache with a warning). Returns the directory in
    use, or None when disabled/unavailable.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("DE_TPU_COMPILE_CACHE", DEFAULT_DIR)
    if cache_dir in ("", "0", "off"):
        return None
    if min_compile_seconds is None:
        min_compile_seconds = float(
            os.environ.get("DE_TPU_COMPILE_CACHE_MIN", "2.0"))
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_seconds))
        # the cache instance binds its directory lazily at the first
        # compile and ignores later config updates — reset it so a
        # mid-process redirect (tests, tooling) actually takes effect
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc)
        _cc.reset_cache()
    except Exception:
        return None
    return cache_dir
