"""Numeric sanitizers — the framework's NaN-guard toolkit.

The reference's numeric safety net (SURVEY.md §5): training aborts on NaN
gradients (/root/reference/opticalflow.lua:332-334), CascadingAddTable dumps
intermediates on NaN (:147-152), Log2 clamps inputs. Here:
  * the training step already skips non-finite-grad updates
    (training/train.py);
  * ``nan_debug()`` enables jax's debug_nans for a scope;
  * ``checked(fn)`` wraps a function with checkify so NaN/OOB errors
    surface as python exceptions with locations.
"""

from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    """Scope with jax_debug_nans enabled (aborts on first NaN produced)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def checked(fn, *, errors=checkify.float_checks):
    """Wrap fn with checkify: returns a function that raises on NaN/inf
    (and other enabled checks) instead of propagating silently."""
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kw):
        err, out = cfn(*args, **kw)
        err.throw()
        return out

    return wrapper
