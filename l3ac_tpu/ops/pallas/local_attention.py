"""Fused block-local causal attention (Pallas TPU kernel).

One grid step = one (batch*head, window) pair: computes the (n x 2n) score
block against [previous | current] window keys entirely in VMEM — QK^T, bias +
causal mask add, fp32 softmax, PV — with no HBM round-trip for the attention
matrix. This replaces the jnp reference in ``l3ac_tpu.ops.attention`` (which
materializes (B, H, W, n, 2n) scores in HBM) on the hot path.

The position-dependent terms (dynamic position bias + causal mask) are folded
into a single additive (H, n, 2n) tensor on the host side of the call —
identical math to the reference (SURVEY.md §2.2 / local-attention==1.11.2
semantics, causal, look_backward=1, exact_windowsize=False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..attention import NEG_INF, local_attention_mask


def _attn_kernel(q_ref, kp_ref, kc_ref, vp_ref, vc_ref, bias_ref, o_ref, *,
                 scale: float):
    w = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32) * scale          # (rq, D) query row tile
    kp = kp_ref[0].astype(jnp.float32)                # (n, D) previous window
    kc = kc_ref[0].astype(jnp.float32)                # (n, D) current window
    n = kc.shape[0]

    s_prev = jax.lax.dot_general(q, kp, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    s_cur = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = jnp.concatenate([s_prev, s_cur], axis=-1)      # (rq, 2n)
    s = s + bias_ref[0]                                # bias + causal mask

    # first window: the "previous" block is window 0 again (clamped index);
    # mask out its columns entirely.
    first_cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < n
    s = jnp.where((w == 0) & first_cols, NEG_INF, s)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom

    vp = vp_ref[0].astype(jnp.float32)
    vc = vc_ref[0].astype(jnp.float32)
    o = (jax.lax.dot_general(p[:, :n], vp, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(p[:, n:], vc, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32))
    o_ref[0] = o.astype(o_ref.dtype)


def _row_tile(n: int) -> tuple[int, int]:
    """(row_tile, padded_n) for the query dimension.

    Small windows run as one (n, 2n) block. Large windows (the 1kbps DownTrans
    window of 750 at fp32 pushes the score/bias/exp buffers past the 16 MiB
    VMEM scope) are split into 256-query row tiles against the full 2n keys:
    the padded query rows carry zero bias, never see NEG_INF-only rows, and
    are cropped from the output.
    """
    if 16 * n * 2 * n <= (6 << 20):  # ~4 fp32 (rq, 2n) buffers stay under 6MiB
        return n, n
    rq = 256
    return rq, -(-n // rq) * rq


@functools.partial(jax.jit, static_argnames=("window_size", "interpret"))
def local_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    window_size: int, bias: jnp.ndarray | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ``ops.attention.local_attention``.

    q, k, v: (B, H, T, D), T a multiple of window_size. bias: (H, n, 2n) or
    None. Returns (B, H, T, D).
    """
    B, H, T, D = q.shape
    n = window_size
    assert T % n == 0
    W = T // n
    BH = B * H
    rq, n_pad = _row_tile(n)
    NR = n_pad // rq

    # windows flattened into the leading axis so each block's trailing dims
    # equal the full array dims (TPU block-shape constraint: last two dims
    # divisible by (8, 128) OR equal to the array dims — n=250/750 and D=32
    # satisfy only the latter; the large-window row tile rq=256 is an (8,128)
    # multiple).
    qf = q.reshape(BH * W, n, D)
    if n_pad != n:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad - n), (0, 0)))
    kf = k.reshape(BH * W, n, D)
    vf = v.reshape(BH * W, n, D)

    # fold causal mask (and bias) into one additive (H, n, 2n) tensor; padded
    # query rows get zero bias (finite scores -> no NaN, rows cropped below)
    mask_add = jnp.where(local_attention_mask(n), 0.0, NEG_INF).astype(jnp.float32)
    if bias is None:
        bias_all = jnp.broadcast_to(mask_add, (H, n, 2 * n))
    else:
        bias_all = bias.astype(jnp.float32) + mask_add
    if n_pad != n:
        bias_all = jnp.pad(bias_all, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (BH, W, NR)

    def q_map(b, w, r):
        return (b * W + w, r, 0)

    def cur_map(b, w, r):
        return (b * W + w, 0, 0)

    def prev_map(b, w, r):
        return (b * W + jnp.maximum(w - 1, 0), 0, 0)

    def bias_map(b, w, r):
        return (b % H, r, 0)

    kernel = functools.partial(_attn_kernel, scale=D ** -0.5)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rq, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, D), prev_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, D), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, D), prev_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, D), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rq, 2 * n), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rq, D), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH * W, n_pad, D), q.dtype),
        interpret=interpret,
    )(qf, kf, kf, vf, vf, bias_all)
    out = out.reshape(B, H, W, n_pad, D)
    if n_pad != n:
        out = out[:, :, :, :n]
    return out.reshape(B, H, T, D)
