"""Halo-exchange sequence parallelism.

The idiomatic TPU equivalent of the reference's sequential ``ChunkData``
streaming (``l3ac/codec.py:124-188``) and of ring/Ulysses-style sequence
parallelism for this model family (SURVEY.md §5 "Long-context"): all attention
is *local* (window <= 750 tokens) and all convs have finite receptive fields,
so cross-chip sequence sharding only needs each shard to receive a fixed halo
of its left (and for non-causal convs, right) neighbor's boundary — one
``ppermute`` per direction, overlappable with compute. No full ring pass is
ever needed.

Used inside ``shard_map`` over the ``sp`` mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange(x: jnp.ndarray, *, left: int, right: int,
                  axis_name: str = "sp", axis: int = 1) -> jnp.ndarray:
    """Concatenate neighbors' boundary slices onto this shard.

    x: local shard, time on ``axis``. Returns x extended by ``left`` frames
    from the left neighbor and ``right`` frames from the right neighbor;
    outermost shards get zero padding (matching the zero context the padded
    monolithic computation sees at sequence ends).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    parts = []
    if left:
        tail = lax.slice_in_dim(x, x.shape[axis] - left, x.shape[axis], axis=axis)
        # shift right: shard i receives shard i-1's tail
        recv = lax.ppermute(tail, axis_name, [(i, i + 1) for i in range(n - 1)])
        recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
        parts.append(recv)
    parts.append(x)
    if right:
        head = lax.slice_in_dim(x, 0, right, axis=axis)
        recv = lax.ppermute(head, axis_name, [(i + 1, i) for i in range(n - 1)])
        recv = jnp.where(idx == n - 1, jnp.zeros_like(recv), recv)
        parts.append(recv)
    return jnp.concatenate(parts, axis=axis)


def crop_halo(x: jnp.ndarray, *, left: int, right: int,
              axis: int = 1) -> jnp.ndarray:
    """Drop the halo region after local computation."""
    start = left
    stop = x.shape[axis] - right
    return lax.slice_in_dim(x, start, stop, axis=axis)


def sp_apply(fn, x: jnp.ndarray, *, halo_in: int, shrink: int = 1,
             axis_name: str = "sp") -> jnp.ndarray:
    """Run a local (finite-receptive-field) ``fn`` under sequence parallelism.

    ``fn`` maps (B, t, C) -> (B, t // shrink, C'); each shard computes on
    [halo | local] and drops the halo's output rows. ``halo_in`` must be a
    multiple of ``shrink``. Exactness: identical to the monolithic computation
    wherever ``fn``'s receptive field <= halo_in (same contract as the
    reference's chunk prefix).
    """
    assert halo_in % shrink == 0
    xh = halo_exchange(x, left=halo_in, right=0, axis_name=axis_name)
    y = fn(xh)
    return crop_halo(y, left=halo_in // shrink, right=0)
