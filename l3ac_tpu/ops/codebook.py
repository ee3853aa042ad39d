"""Nearest-code search over large codebooks — generic framework capability.

L3AC's FSQ needs no search (encode is closed-form rounding, SURVEY.md §0), but
the framework provides the general sharded codebook-search path called for by
BASELINE.json: tiled distance-matmul + argmin over HBM-resident codebooks
(117k-250k entries), tensor-shardable over ICI with an argmin combine.

``nearest_codes``: single-device tiled search (XLA fuses the -2qc^T matmul with
the norm adds; tiling over N keeps the distance matrix out of HBM).
``sharded_nearest_codes``: codebook rows sharded over a mesh axis inside
shard_map; each shard searches locally, then the (dist, idx) pair is reduced
with an all-gather + argmin — one small collective, no distance traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("tile",))
def nearest_codes(queries: jnp.ndarray, codebook: jnp.ndarray,
                  tile: int = 4096):
    """queries (M, d), codebook (N, d) -> (indices (M,) int32, dists (M,) f32).

    Squared-L2 nearest neighbor: ||q||^2 - 2 q.c + ||c||^2 (the ||q||^2 term is
    argmin-invariant and dropped). Scanned in N-tiles so the (M, N) distance
    matrix never materializes.
    """
    M, d = queries.shape
    N = codebook.shape[0]
    pad = (-N) % tile
    cb = jnp.pad(codebook, ((0, pad), (0, 0)))
    cnorm = jnp.sum(cb.astype(jnp.float32) ** 2, axis=-1)
    if pad:
        cnorm = cnorm.at[N:].set(jnp.inf)
    n_tiles = (N + pad) // tile
    cb_t = cb.reshape(n_tiles, tile, d)
    cn_t = cnorm.reshape(n_tiles, tile)
    q = queries.astype(jnp.float32)

    def body(carry, xs):
        best_d, best_i = carry
        c, cn, start = xs
        scores = cn[None, :] - 2.0 * jnp.dot(
            q, c.T.astype(jnp.float32), preferred_element_type=jnp.float32)
        tile_min = jnp.min(scores, axis=-1)
        tile_arg = jnp.argmin(scores, axis=-1).astype(jnp.int32) + start
        better = tile_min < best_d
        return (jnp.where(better, tile_min, best_d),
                jnp.where(better, tile_arg, best_i)), None

    # tie the init to the codebook value so its device-varying type matches the
    # scan outputs under shard_map (pvary): 0*cb[0,0] is exactly 0 but varying
    zero = (cb[0, 0] * 0.0).astype(jnp.float32)
    init = (jnp.full((M,), jnp.inf, jnp.float32) + zero,
            jnp.zeros((M,), jnp.int32) + zero.astype(jnp.int32))
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    (best_d, best_i), _ = lax.scan(body, init, (cb_t, cn_t, starts))
    qnorm = jnp.sum(q ** 2, axis=-1)
    return best_i, best_d + qnorm


def sharded_nearest_codes(queries: jnp.ndarray, codebook_shard: jnp.ndarray, *,
                          axis_name: str, tile: int = 4096):
    """Inside shard_map: codebook rows sharded over ``axis_name``; queries
    replicated. Returns globally-correct (indices, dists) on every shard."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    local_n = codebook_shard.shape[0]
    idx, dist = nearest_codes(queries, codebook_shard, tile=tile)
    idx = idx + my * local_n
    all_dist = lax.all_gather(dist, axis_name)          # (n_dev, M)
    all_idx = lax.all_gather(idx, axis_name)
    win = jnp.argmin(all_dist, axis=0)                  # (M,)
    m = jnp.arange(queries.shape[0])
    return all_idx[win, m], all_dist[win, m]
