"""Numerics debugging helpers (SURVEY.md §5: race detection / sanitizers are a
framework addition — jax checkify + NaN tracing stand in for CUDA sanitizers).
"""

from __future__ import annotations

import contextlib
import functools

import jax
from jax.experimental import checkify


def checked(fn, *, errors=checkify.float_checks):
    """Wrap a jittable fn so NaN/Inf (and other enabled checks) raise with
    location info instead of silently propagating.

    Returns a callable with the same signature; raises ValueError on error.
    """

    checked_fn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


@contextlib.contextmanager
def nan_debug():
    """Enable jax's global NaN debugging for a scope (slow; eager re-runs)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def finite_or_raise(tree, name: str = "tree"):
    """Host-side check that every leaf is finite."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(f"non-finite values in {name}{path}")
