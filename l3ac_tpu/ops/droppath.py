"""Stochastic depth (drop-path) for residual branches.

Matches the reference ``Residual.drop_path`` (``l3ac/xtract/nn/layers.py:48-62``):
per-SAMPLE Bernoulli keep mask over the residual *branch* output, scaled by
1/keep_prob (``scale_by_keep=True``, the reference default). Train-only — the
callers gate on ``rng is not None``; inference never pays the mask.
"""

import jax
import jax.numpy as jnp


def drop_path(rng, delta: jnp.ndarray, drop_rate: float,
              scale_by_keep: bool = True) -> jnp.ndarray:
    """Randomly zero the residual branch ``delta`` per batch sample.

    ``delta``: branch output with batch on axis 0 (works for both (B, T, C)
    and the transposed (B, C, T) layout). Static ``drop_rate`` in [0, 1).
    """
    if drop_rate <= 0.0:
        return delta
    keep = 1.0 - drop_rate
    shape = (delta.shape[0],) + (1,) * (delta.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(delta.dtype)
    if scale_by_keep:
        mask = mask / jnp.asarray(keep, delta.dtype)
    return delta * mask


def schedule(rate: float, n: int, rng, *, ascending: bool = True) -> list:
    """Per-unit ``(drop_rate, rng)`` pairs, torch.linspace scheduling:
    encoder ramps 0 -> rate (reference ``l3ac/modules.py:89``), decoder
    rate -> 0 (``:153``). With ``rate`` 0 or no ``rng``: all inert."""
    if not isinstance(rate, (int, float)):
        raise TypeError(
            "drop_path_rate must be a static Python float (it selects the "
            "per-unit schedule at trace time); got a traced value of type "
            f"{type(rate).__name__} — close it over the jitted function "
            "instead of passing it as an argument")
    if rate <= 0.0 or rng is None or n == 0:
        return [(0.0, None)] * n
    denom = max(n - 1, 1)
    fracs = [i / denom for i in range(n)]
    if not ascending:
        fracs = [1.0 - f for f in fracs]
    keys = jax.random.split(rng, n)
    return [(rate * f, k) for f, k in zip(fracs, keys)]
