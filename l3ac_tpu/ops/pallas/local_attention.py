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


def _attn_kernel(q_ref, kp_ref, kc_ref, vp_ref, vc_ref, kp0_ref, vp0_ref,
                 bias_ref, o_ref, *, scale: float):
    w = pl.program_id(2)

    # matmuls run in the INPUT dtype with fp32 accumulation: in production
    # (bf16 activations) this is the MXU's native rate — forcing fp32
    # operands costs ~4-8x on v5e and is MORE precise than the jnp bf16
    # reference path, not equal to it. fp32 inputs stay exactly as before
    # (the parity suites run fp32). The scale and softmax stay fp32.
    mdt = q_ref.dtype
    # scale on q in the input dtype — the jnp reference's exact placement
    # (ops/attention.py: bq = q.reshape(...) * scale)
    q = q_ref[0] * jnp.asarray(scale, mdt)            # (rq, D) query row tile
    # window 0's "previous" block comes from the kp0/vp0 operands: zeros in
    # the monolithic case (its columns are NEG_INF-masked via the w==0 bias
    # plane), the left neighbor shard's last window under SP
    kp = jnp.where(w == 0, kp0_ref[0], kp_ref[0])
    kc = kc_ref[0]                                    # (n, D) current window
    n = kc.shape[0]

    s_prev = jax.lax.dot_general(q, kp, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    s_cur = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = jnp.concatenate([s_prev, s_cur], axis=-1)      # (rq, 2n) fp32
    # bias + causal mask (+ w==0 prev-col mask); stored in the input dtype —
    # the bias block is the kernel's dominant HBM stream (rq x 2n per step)
    s = s + bias_ref[0, 0].astype(jnp.float32)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # reciprocal on the (rq, 1) column, broadcast-multiplied: a full-size
    # (rq, 2n) VPU divide costs ~5x a multiply
    p = (e * (1.0 / denom)).astype(mdt)

    vp = jnp.where(w == 0, vp0_ref[0], vp_ref[0])
    vc = vc_ref[0]
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
                    prev_k: jnp.ndarray | None = None,
                    prev_v: jnp.ndarray | None = None,
                    left_edge: jnp.ndarray | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ``ops.attention.local_attention``.

    q, k, v: (B, H, T, D), T a multiple of window_size. bias: (H, n, 2n) or
    None. Returns (B, H, T, D).

    SP: ``prev_k``/``prev_v`` are the left neighbor shard's last KV window,
    (B, H, n, D) (``parallel.sp.halo_blocks`` on the window axis), and
    ``left_edge`` a traced 0/1 scalar — 1 on the globally-first shard, whose
    first window masks its backward keys exactly like the monolithic case.
    """
    B, H, T, D = q.shape
    n = window_size
    assert T % n == 0
    assert (prev_k is None) == (prev_v is None) == (left_edge is None)
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
    if prev_k is None:
        kp0 = jnp.zeros((BH, n, D), q.dtype)
        vp0 = kp0
        mask_first = True                      # static: always mask
    else:
        kp0 = prev_k.astype(q.dtype).reshape(BH, n, D)
        vp0 = prev_v.astype(q.dtype).reshape(BH, n, D)
        mask_first = left_edge == 1            # traced 0/1 scalar

    # fold causal mask (and bias) into one additive tensor, stacked as
    # (2, H, n_pad, 2n): plane 0 serves window 0 (backward keys NEG_INF-masked
    # when this shard is the global start), plane 1 every other window. Padded
    # query rows get zero bias (finite scores -> no NaN, rows cropped below).
    mask_add = jnp.where(local_attention_mask(n), 0.0, NEG_INF).astype(jnp.float32)
    if bias is None:
        bias_all = jnp.broadcast_to(mask_add, (H, n, 2 * n))
    else:
        bias_all = bias.astype(jnp.float32) + mask_add
    first_cols = (jnp.arange(2 * n) < n)[None, None, :]
    bias_w0 = jnp.where(jnp.logical_and(first_cols, mask_first), NEG_INF,
                        bias_all)
    # stored in the INPUT dtype: the (rq, 2n) bias block is the kernel's
    # dominant HBM stream (fp32 NEG_INF saturates to bf16 -inf, which the
    # softmax handles identically); fp32 inputs keep fp32 bias exactly
    bias_st = jnp.stack([bias_w0, bias_all]).astype(q.dtype)   # (2, H, n, 2n)
    if n_pad != n:
        bias_st = jnp.pad(bias_st, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    # W innermost: the bias block's index is constant for w >= 1, so Pallas's
    # consecutive-step DMA elision fetches each (rq, 2n) bias block ~twice per
    # (batch*head, row-tile) instead of once per window — at window 750 the
    # bias stream falls from ~1.5 GB to ~0.2 GB per call, which WAS the
    # kernel's wall (measured r5; see BENCH_NOTES)
    grid = (BH, NR, W)

    def q_map(b, r, w):
        return (b * W + w, r, 0)

    def cur_map(b, r, w):
        return (b * W + w, 0, 0)

    def prev_map(b, r, w):
        return (b * W + jnp.maximum(w - 1, 0), 0, 0)

    def p0_map(b, r, w):
        return (b, 0, 0)

    def bias_map(b, r, w):
        return (jnp.minimum(w, 1), b % H, r, 0)

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
            pl.BlockSpec((1, n, D), p0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, D), p0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rq, 2 * n), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rq, D), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH * W, n_pad, D), q.dtype),
        interpret=interpret,
    )(qf, kf, kf, vf, vf, kp0, vp0, bias_st)
    out = out.reshape(B, H, W, n_pad, D)
    if n_pad != n:
        out = out[:, :, :, :n]
    return out.reshape(B, H, T, D)
