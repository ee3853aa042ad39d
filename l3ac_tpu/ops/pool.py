"""Trend pooling (reference ``l3ac/tconv/base.py:8-14``).

``trend_pool(x, k) = avg_pool(max_pool(|x|, k, stride=1, pad=k//2), same)``.

Padding semantics replicate torch exactly:
- max_pool1d pads with -inf (harmless here since |x| >= 0 but kept for exactness),
- avg_pool1d pads with 0 and *includes* padding in the count
  (torch's count_include_pad=True default) — i.e. always divides by k.
"""

import jax.numpy as jnp
from jax import lax


def _pool(x: jnp.ndarray, k: int, init, op, pad_value) -> jnp.ndarray:
    # x: (B, T, C); window over T with stride 1, symmetric pad k//2.
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), constant_values=pad_value)
    return lax.reduce_window(
        xp, init, op,
        window_dimensions=(1, k, 1),
        window_strides=(1, 1, 1),
        padding="VALID",
    )


def trend_pool(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T, C). Identity when kernel_size <= 1."""
    if kernel_size <= 1:
        return x
    k = kernel_size
    m = _pool(jnp.abs(x), k, -jnp.inf, lax.max, -jnp.inf)
    s = _pool(m, k, 0.0, lax.add, 0.0)
    return s / k
