"""Causal block-local windowed attention.

Reproduces the semantics of the pinned ``local-attention==1.11.2`` package the
reference depends on (``l3ac/local_trans.py:23``, ``pyproject.toml:12``; see
SURVEY.md §2.2), with the reference's call-site configuration locked in:
``causal=True, look_backward=1, look_forward=0, autopad=True,
exact_windowsize=False, scale=dim_head**-0.5``.

Layout: the sequence (padded to a window multiple) is reshaped into windows of
size ``n``; each query window attends to its own window plus the previous one
(keys of length 2n), under a causal mask on absolute positions. Receptive field
per layer is up to ``2n - 1``. This maps 1:1 onto TPU: every (n x 2n) attention
block is a pair of MXU matmuls with static shapes; the mask and the dynamic
position bias are position-only and get folded into a single additive (n, 2n)
bias term per head, precomputed once per forward.

Right-padding (autopad) is safe under the causal mask: padded keys sit at
positions strictly greater than every real query, so they are always masked;
padded query rows are cropped from the output.
"""

import functools

import jax
import jax.numpy as jnp

from ..parallel import sp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def local_attention_mask(window_size: int) -> jnp.ndarray:
    """(n, 2n) bool mask, True = attendable.

    Query i (global pos w*n + i) vs key j of the concatenated [prev | cur]
    window (global pos (w-1)*n + j): causal  ⇔  j <= n + i. With
    exact_windowsize=False there is no lower bound beyond the window extent.
    First-window padding (keys j < n when w == 0) is handled by the caller.
    """
    n = window_size
    i = jnp.arange(n)[:, None]
    j = jnp.arange(2 * n)[None, :]
    return j <= (i + n)


def dynamic_position_bias(params: dict, window_size: int) -> jnp.ndarray:
    """DynamicPositionBias MLP -> (heads, n, 2n) additive bias.

    Matches local-attention's transformer.DynamicPositionBias: an MLP
    (Linear 1->d, SiLU, Linear d->d, SiLU, Linear d->heads) over |relative
    distance|, evaluated once per forward. bias[h, i, j] = mlp(|n + i - j|)[h].
    """
    n = window_size
    rel = jnp.arange(2 * n, dtype=jnp.float32)[:, None]  # (2n, 1)
    h = jax.nn.silu(rel @ params["w0"] + params["b0"])
    h = jax.nn.silu(h @ params["w1"] + params["b1"])
    table = h @ params["w2"] + params["b2"]              # (2n, heads)
    # The bias is TOEPLITZ — bias[h, i, j] = table[|n + i - j|, h] — so the
    # (heads, n, 2n) matrix is n sliding windows of the mirrored table
    # wt[k] = table[|k - (2n-1)|]. A gather builds it in ~3 ms on v5e
    # (window 750; gathers serialize per index); the classic tile-and-reshape
    # trick below builds the identical values with only contiguous
    # copies/reshapes (~0.1 ms): tiling a length-M vector n+1 times and
    # reshaping to (n, M+1) advances each row's read offset by exactly one,
    # row r col j = u[(r + j) mod M], and M = 4n makes every needed index
    # wrap-free (max r + j = 3n - 2 < M).
    wt = jnp.concatenate([table[:0:-1], table], axis=0)   # (4n-1, H) mirrored
    M = 4 * n
    u = jnp.pad(wt.T, ((0, 0), (0, M - wt.shape[0])))     # (H, M)
    s = jnp.tile(u, (1, n + 1))[:, :n * (M + 1)].reshape(-1, n, M + 1)
    # window rows come out in ascending offset r' = n-1-i order; flip to i
    return s[:, ::-1, :2 * n]                             # (heads, n, 2n)


def rotary_freqs(window_size: int, dim: int) -> jnp.ndarray:
    """Sinusoidal rotary frequency table over the [prev | cur] key extent.

    Matches local-attention 1.11.2's SinusoidalEmbeddings (use_xpos=False):
    ``inv_freq = 10000^{-2i/d}``, positions are window-relative 0..2n-1 (the
    package evaluates freqs on the looked-around keys and queries take the
    last n rows), duplicated to fill the head dim. Returns (2n, dim) fp32.
    """
    inv = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(2 * window_size, dtype=jnp.float32)
    fr = t[:, None] * inv[None, :]
    return jnp.concatenate([fr, fr], axis=-1)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def apply_rotary(q_w: jnp.ndarray, k_w: jnp.ndarray,
                 freqs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate windowed q (..., n, d) / looked-around k (..., 2n, d) by the
    window-relative freqs table (local-attention 1.11.2 apply_rotary_pos_emb,
    half-split rotate, scale=1)."""
    n = q_w.shape[-2]
    qf = freqs[-n:]
    cq, sq = jnp.cos(qf).astype(q_w.dtype), jnp.sin(qf).astype(q_w.dtype)
    ck, sk = jnp.cos(freqs).astype(k_w.dtype), jnp.sin(freqs).astype(k_w.dtype)
    q = q_w * cq + _rotate_half(q_w) * sq
    k = k_w * ck + _rotate_half(k_w) * sk
    return q, k


def local_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    window_size: int,
                    bias: jnp.ndarray | None = None,
                    rotary: bool = False) -> jnp.ndarray:
    """Causal local windowed attention.

    q, k, v: (B, H, T, D) with T a multiple of window_size (caller pads).
    bias: optional (H, n, 2n) additive position bias.
    rotary: apply window-relative rotary embeddings to q/k — the reference's
    ``use_rotary_pos_emb`` path, active when dynamic position bias is off
    (dead in all released configs, SURVEY.md §2.2).
    Returns (B, H, T, D).

    Under sequence parallelism (``parallel.sp``) the first local window's
    "previous" KV block is fetched from the left neighbor shard with one
    ``ppermute`` (the windowed structure makes this the entire cross-shard
    communication of the layer); only the globally-first window masks its
    backward keys. The SP path is never wrapped in its own ``jax.jit``: it is
    only reachable inside a ``shard_map`` body (already under the caller's
    trace), and the jit cache would not key on the sp context. The non-SP path
    is jitted so eager callers don't run op-by-op.
    """
    if sp.active():
        return _local_attention_body(q, k, v, bias, window_size=window_size,
                                     rotary=rotary)
    return _local_attention_jit(q, k, v, bias, window_size=window_size,
                                rotary=rotary)


def _local_attention_body(q, k, v, bias, *, window_size: int,
                          rotary: bool) -> jnp.ndarray:
    B, H, T, D = q.shape
    n = window_size
    assert T % n == 0, (T, n)
    W = T // n
    scale = D ** -0.5

    bq = q.reshape(B, H, W, n, D) * scale
    bk = k.reshape(B, H, W, n, D)
    bv = v.reshape(B, H, W, n, D)

    # keys/values of [previous | current] window; the globally-first window's
    # "previous" is a zero block whose logits get masked below. Under SP, each
    # shard's first window receives the left neighbor's last KV window
    # (ppermute zero-fills shard 0, which masks it anyway).
    if sp.active():
        assert not rotary, "rotary path not supported under sequence parallelism"
        prev0_k = sp._send_right(bk[:, :, -1:])
        prev0_v = sp._send_right(bv[:, :, -1:])
    else:
        prev0_k = jnp.zeros_like(bk[:, :, :1])
        prev0_v = jnp.zeros_like(bv[:, :, :1])
    prev_k = jnp.concatenate([prev0_k, bk[:, :, :-1]], axis=2)
    prev_v = jnp.concatenate([prev0_v, bv[:, :, :-1]], axis=2)
    kk = jnp.concatenate([prev_k, bk], axis=3)  # (B, H, W, 2n, D)
    vv = jnp.concatenate([prev_v, bv], axis=3)

    if rotary:
        bq, kk = apply_rotary(bq, kk, rotary_freqs(n, D))

    sim = jnp.einsum("bhwid,bhwjd->bhwij", bq, kk,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias[None, :, None].astype(sim.dtype)

    mask = local_attention_mask(n)[None, None, None]          # causal
    # globally-first window: keys j < n have no real previous block -> invalid
    first = (jnp.arange(W)[:, None, None] == 0) & (jnp.arange(2 * n)[None, None, :] < n)
    first = first[None, None]
    if sp.active():
        first = first & (sp.index() == 0)
    mask = mask & ~first
    sim = jnp.where(mask, sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhwij,bhwjd->bhwid", attn.astype(vv.dtype), vv)
    return out.reshape(B, H, T, D)


_local_attention_jit = functools.partial(
    jax.jit, static_argnames=("window_size", "rotary"))(_local_attention_body)
