"""Persistent compilation cache (utils/compcache.py): entries are written
under the configured directory and the disable knobs work."""

import os

import jax
import jax.numpy as jnp

from depth_estimation_tpu.utils import compcache


def test_cache_entries_written(tmp_path):
    d = str(tmp_path / "xla-cache")
    try:
        assert compcache.enable_persistent_cache(d, 0.0) == d

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T + 3.25

        f(jnp.ones((64, 64))).block_until_ready()
        assert any(n.endswith("-cache") for n in os.listdir(d))
    finally:
        # restore the session-default cache for the rest of the suite
        compcache.enable_persistent_cache()


def test_disable_knob():
    assert compcache.enable_persistent_cache("off") is None
    assert compcache.enable_persistent_cache("0") is None
    # config untouched by the disabled calls: the session default (set by
    # the package import in conftest-driven tests) is still in effect
    assert jax.config.jax_compilation_cache_dir not in ("", "0", "off")
