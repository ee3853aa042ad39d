"""Elementwise activations (VPU ops).

Semantics match the reference implementations:
- snake: ``x + (alpha + eps)^-1 * sin(alpha * x)^2`` (reference ``l3ac/layers.py:29-33``)
- gelu: exact (erf) variant, matching ``torch.nn.GELU()`` defaults
- geglu: ``x * gelu(gate)`` as used by the local-transformer feed-forward
"""

import jax.numpy as jnp
from jax import nn as jnn

EPS = 1e-8


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation with per-channel ``alpha``.

    ``x``: (..., C) channels-last; ``alpha``: broadcastable to ``x`` (typically (C,)).
    """
    return x + jnp.sin(alpha * x) ** 2 / (alpha + EPS)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU — matches ``torch.nn.GELU(approximate='none')``."""
    return jnn.gelu(x, approximate=False)


def geglu(x: jnp.ndarray) -> jnp.ndarray:
    """GEGLU over the last dim: split in half, ``a * gelu(b)``.

    Matches the GEGLU used by the local-attention transformer feed-forward
    (reference dep ``local-attention==1.11.2``; see SURVEY.md §2.2).
    """
    a, b = jnp.split(x, 2, axis=-1)
    return a * gelu(b)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jnn.silu(x)
