"""Fused decoder tail Pallas kernel — transposed (C, T) layout.

The 'legacy' decoder tail (reference ``l3ac/modules.py:174-195``) runs at full
audio rate with only 24 channels. In the natural (T, C) layout every MXU/VPU
op uses 24 of 128 lanes and the conv matmuls stream M=T rows against K=N=24 —
measured 92 ms vs XLA's 62 ms at B=16/10 s. Transposing to (C, T) puts time in
lanes: each conv tap is a (24, 24) @ (24, S) matmul whose MXU time scales with
M=24 streamed rows instead of M=S (5x fewer cycles), and every elementwise op
runs at full lane width.

Chain per tile, entirely in VMEM:

    3 x [ x + Conv_k1(Snake(Conv_k7_dil{1,3,9}(Snake(x)))) ]
    -> Snake -> Conv_k7 (C->1) -> Tanh

Chained convs need exact zero-padding semantics at sequence edges at *every*
stage: out-of-sequence lanes are re-zeroed after each conv (a conv's bias
makes zero inputs nonzero, which must not leak back in). Halo = 3*(1+3+9)+3 =
42 samples per side from neighbor tiles.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _math

DILATIONS = (1, 3, 9)
HALO = 3 * sum(DILATIONS) + 3  # 42
PHALO = HALO // 2              # per-phase halo of the polyphase variant

# Time-tile length. Swept on v5e (r5, tools/sweep_tiles.py): the per-tile
# matmul population is ~62 tiny (24, 24) @ (24, S+2h) products, so larger
# tiles amortize MXU issue overhead (2048: 3.14 ms, 4096: 3.01, 8192: 2.81
# isolated). 8192 fits the fast-sine production kernel but OOMs scoped VMEM
# (18.5 of 16 MiB) under the EXACT-sine variant — Mosaic's sin lowering needs
# extra scratch — so the default stays 4096, safe for both sine modes.
# Env override exists for hardware sweeps only (trace-time constant).
TILE = int(os.environ.get("L3AC_TPU_TAIL_TILE", "4096"))


def _snake(x, a):
    # fp32 snake (see ops/pallas/_math.snake — honors L3AC_TPU_FAST_SINE);
    # storage stays in the activation dtype. NOTE an im2col single-matmul
    # form of the k7 convs was tried in round 3 and abandoned: Mosaic cannot
    # legalize the (24-sublane) tap stacking (vector concat rejects mixed
    # offsets; scratch stores and lane-roll variants compile but hang on
    # hardware), so the 7-matmul form stays.
    return _math.snake(x, a).astype(x.dtype)


def _conv_lanes(x, wt, b, dilation, R, cdt):
    """Conv along lanes. x: (C, Rp) already zero-padded by (K-1)*dil//2 on
    each side; wt: (K, Cout, Cin) pre-transposed; b: (Cout, 1). Matmuls run
    in the weight dtype with fp32 accumulation, result cast back to ``cdt``."""
    K = wt.shape[0]
    acc = jnp.broadcast_to(b.astype(jnp.float32), (wt.shape[1], R))
    xw = x.astype(wt.dtype)
    for k in range(K):
        acc = acc + jnp.dot(wt[k], xw[:, k * dilation:k * dilation + R],
                            preferred_element_type=jnp.float32)
    return acc.astype(cdt)


def _kernel(xp_ref, xc_ref, xn_ref, lh_ref, bounds_ref, a1_ref, w1t_ref,
            b1_ref, a2_ref, w2t_ref, b2_ref, ao_ref, wot_ref, bo_ref, o_ref,
            *, n_tiles: int):
    t = pl.program_id(1)
    C = xc_ref.shape[1]
    S = xc_ref.shape[2]
    R = S + 2 * HALO
    # activations stay in the input dtype (bf16 in production): the kernel is
    # VMEM-bandwidth-bound; matmuls accumulate fp32 inside _conv_lanes
    cdt = xc_ref.dtype

    prev = xp_ref[0, :, S - HALO:]
    nxt = xn_ref[0, :, :HALO]
    # tile 0's left context: zeros monolithically, the left neighbor's
    # boundary under SP (lh operand); the right halo is appended in-array
    prev = jnp.where(t == 0, lh_ref[0], prev)
    nxt = jnp.where(t == n_tiles - 1, jnp.zeros_like(nxt), nxt)
    x = jnp.concatenate([prev, xc_ref[0], nxt], axis=1)

    # valid column range [lo, hi): [0, T) monolithically; under SP the halo
    # regions hold REAL neighbor data, so interior shard edges extend the
    # range by HALO and only global edges keep zero-pad semantics
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1) + (t * S - HALO)
    valid = (cols >= bounds_ref[0]) & (cols < bounds_ref[1])
    x = jnp.where(valid, x, jnp.zeros((), cdt))

    for u, d in enumerate(DILATIONS):
        h = _snake(x, a1_ref[u].astype(cdt))
        pad = 3 * d
        hp = jnp.pad(h, ((0, 0), (pad, pad)))
        h = _conv_lanes(hp, w1t_ref[u], b1_ref[u], d, R, cdt)
        h = jnp.where(valid, h, jnp.zeros((), cdt))
        h = _snake(h, a2_ref[u].astype(cdt))
        h = (jnp.dot(w2t_ref[u], h.astype(w2t_ref.dtype),
                     preferred_element_type=jnp.float32) +
             b2_ref[u].astype(jnp.float32)).astype(cdt)
        x = jnp.where(valid, x + h, jnp.zeros((), cdt))

    h = _snake(x, ao_ref[0].astype(cdt))
    hp = jnp.pad(h, ((0, 0), (3, 3)))
    y = _conv_lanes(hp, wot_ref[...], bo_ref[...], 1, R, jnp.float32)
    o_ref[0] = jnp.tanh(y[:, HALO:HALO + S]).astype(o_ref.dtype)


def _kernel_poly(x0p_ref, x0c_ref, x0n_ref, x1p_ref, x1c_ref, x1n_ref,
                 lh0_ref, lh1_ref, bounds_ref, a1_ref, w1t_ref, b1_ref,
                 a2_ref, w2t_ref, b2_ref, ao_ref, wot_ref, bo_ref,
                 o0_ref, o1_ref, *, n_tiles: int):
    """Polyphase (stride-2) tail: the whole chain runs on the two phase
    arrays of the up-path's output WITHOUT ever materializing the interleaved
    sequence. A k-tap conv at dilation d over interleaved time decomposes
    exactly into per-phase taps with static phase routing:

        y_q[t] = sum_k w[k] . x_{(q+(k-3)d) mod 2}[t + (q+(k-3)d) // 2]

    (all DILATIONS are odd, so each tap flips phase deterministically; the
    identity is exercised bit-level by tests against the interleaved kernel).
    """
    t = pl.program_id(1)
    C = x0c_ref.shape[1]
    S = x0c_ref.shape[2]
    R = S + 2 * PHALO
    cdt = x0c_ref.dtype

    xs = []
    for xp_ref, xc_ref, xn_ref, lh_ref in (
            (x0p_ref, x0c_ref, x0n_ref, lh0_ref),
            (x1p_ref, x1c_ref, x1n_ref, lh1_ref)):
        prev = xp_ref[0, :, S - PHALO:]
        nxt = xn_ref[0, :, :PHALO]
        prev = jnp.where(t == 0, lh_ref[0], prev)
        nxt = jnp.where(t == n_tiles - 1, jnp.zeros_like(nxt), nxt)
        xs.append(jnp.concatenate([prev, xc_ref[0], nxt], axis=1))

    # validity in INTERLEAVED coordinates: working col j of phase q sits at
    # n = 2*(t*S - PHALO + j) + q
    cbase = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1) + (t * S - PHALO)
    valid = [(2 * cbase + q >= bounds_ref[0]) & (2 * cbase + q < bounds_ref[1])
             for q in (0, 1)]
    zero = jnp.zeros((), cdt)
    x = [jnp.where(valid[q], xs[q], zero) for q in (0, 1)]

    def conv_poly(h, wt, b, d, odt):
        """k7 conv at (odd) dilation d on the phase pair; fp32 accumulation."""
        pd = (3 * d + 1) // 2
        hp = [jnp.pad(h[q], ((0, 0), (pd, pd))).astype(wt.dtype)
              for q in (0, 1)]
        outs = []
        for q in (0, 1):
            acc = jnp.broadcast_to(b.astype(jnp.float32), (wt.shape[1], R))
            for k in range(7):
                tot = q + (k - 3) * d
                src, m = tot % 2, tot // 2
                acc = acc + jnp.dot(wt[k], hp[src][:, pd + m:pd + m + R],
                                    preferred_element_type=jnp.float32)
            outs.append(acc.astype(odt))
        return outs

    for u, d in enumerate(DILATIONS):
        h = [_snake(x[q], a1_ref[u].astype(cdt)) for q in (0, 1)]
        h = conv_poly(h, w1t_ref[u], b1_ref[u], d, cdt)
        h = [jnp.where(valid[q], h[q], zero) for q in (0, 1)]
        h = [_snake(h[q], a2_ref[u].astype(cdt)) for q in (0, 1)]
        h = [(jnp.dot(w2t_ref[u], h[q].astype(w2t_ref.dtype),
                      preferred_element_type=jnp.float32) +
              b2_ref[u].astype(jnp.float32)).astype(cdt) for q in (0, 1)]
        x = [jnp.where(valid[q], x[q] + h[q], zero) for q in (0, 1)]

    h = [_snake(x[q], ao_ref[0].astype(cdt)) for q in (0, 1)]
    y = conv_poly(h, wot_ref[...], bo_ref[...], 1, jnp.float32)
    o0_ref[0] = jnp.tanh(y[0][:, PHALO:PHALO + S]).astype(o0_ref.dtype)
    o1_ref[0] = jnp.tanh(y[1][:, PHALO:PHALO + S]).astype(o1_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def legacy_tail_poly_ct(x0: jnp.ndarray, x1: jnp.ndarray, tail_units: list,
                        tail_alpha, out_conv, *,
                        lh: tuple | None = None, rh: tuple | None = None,
                        edges: jnp.ndarray | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """Polyphase tail input: even/odd phase arrays x0/x1 (B, C, Tt) of the
    interleaved tail input (``x[.., 2t] == x0[.., t]``, e.g. straight from
    ``upsample.up_fused_ct(phase_split=True)`` at scale 2) -> audio
    (B, 2*Tt, 1). Exactly :func:`legacy_tail_ct`'s math with the stage-3
    interleave relayout and its re-read deleted.

    SP: ``lh``/``rh`` are PAIRS of (B, C, PHALO) per-phase neighbor boundary
    blocks; ``edges`` the [is_first, is_last] flags as in legacy_tail_ct."""
    B, C, Tt = x0.shape
    assert x1.shape == (B, C, Tt)
    assert (lh is None) == (rh is None) == (edges is None)
    T = 2 * Tt
    if rh is not None:
        x0 = jnp.concatenate([x0, rh[0].astype(x0.dtype)], axis=2)
        x1 = jnp.concatenate([x1, rh[1].astype(x1.dtype)], axis=2)
    if lh is None:
        lh0 = lh1 = jnp.zeros((B, C, PHALO), x0.dtype)
    else:
        lh0, lh1 = (lh[0].astype(x0.dtype), lh[1].astype(x0.dtype))
        assert lh0.shape == (B, C, PHALO), lh0.shape
    if edges is None:
        bounds = jnp.asarray([0, T], jnp.int32)
    else:
        bounds = jnp.stack([
            jnp.where(edges[0] == 1, 0, -HALO),
            T + jnp.where(edges[1] == 1, 0, HALO)]).astype(jnp.int32)
    Tin = x0.shape[2]
    S = TILE
    pad = (-Tin) % S
    if pad:
        x0 = jnp.pad(x0, ((0, 0), (0, 0), (0, pad)))
        x1 = jnp.pad(x1, ((0, 0), (0, 0), (0, pad)))
    NT = (Tin + pad) // S

    a1 = jnp.stack([u["alpha1"] for u in tail_units])[..., None]
    w1t = jnp.stack([u["conv1"]["w"] for u in tail_units]) \
        .transpose(0, 1, 3, 2)
    b1 = jnp.stack([u["conv1"]["b"] for u in tail_units])[..., None]
    a2 = jnp.stack([u["alpha2"] for u in tail_units])[..., None]
    w2t = jnp.stack([u["conv2"]["w"][0].T for u in tail_units])
    b2 = jnp.stack([u["conv2"]["b"] for u in tail_units])[..., None]
    ao = tail_alpha.reshape(1, -1, 1)
    wot = out_conv["w"].transpose(0, 2, 1)
    bo = out_conv["b"].reshape(1, 1)

    def cur_map(b, t):
        return (b, 0, t)

    def prev_map(b, t):
        return (b, 0, jnp.maximum(t - 1, 0))

    def next_map(b, t):
        return (b, 0, jnp.minimum(t + 1, NT - 1))

    xspec = lambda imap: pl.BlockSpec((1, C, S), imap, memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    lhspec = pl.BlockSpec((1, C, PHALO), lambda b, t: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    consts = [a1, w1t, b1, a2, w2t, b2, ao, wot, bo]
    ospec = pl.BlockSpec((1, 1, S), cur_map, memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_poly, n_tiles=NT)
    o0, o1 = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[xspec(prev_map), xspec(cur_map), xspec(next_map)] * 2 +
                 [lhspec, lhspec, bspec] + [full(a) for a in consts],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((B, 1, Tin + pad), x0.dtype)] * 2,
        interpret=interpret,
    )(x0, x0, x0, x1, x1, x1, lh0, lh1, bounds, *consts)
    # 1-channel interleave of the two finished phase streams — the ONLY
    # interleave left on the tail path (24x narrower than the old stage-3
    # relayout)
    out = jnp.stack([o0[:, 0], o1[:, 0]], axis=2)      # (B, Tin+pad, 2)
    out = out.reshape(B, (Tin + pad) * 2, 1)
    return out[:, :T]


@functools.partial(jax.jit, static_argnames=("interpret",))
def legacy_tail_ct(x: jnp.ndarray, tail_units: list, tail_alpha, out_conv, *,
                   lh: jnp.ndarray | None = None,
                   rh: jnp.ndarray | None = None,
                   edges: jnp.ndarray | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """Transposed input: x (B, C=24, T) -> audio (B, T, 1). Blocks are sliced
    straight out of (B, C, T) by index maps — no relayout, so the tail chains
    onto the transposed narrow decoder section for free.

    SP: ``lh``/``rh`` are (B, C, HALO) neighbor boundary blocks
    (``parallel.sp.halo_blocks``) and ``edges`` is the (2,) int32
    [is_first_shard, is_last_shard] flag pair (``parallel.sp.edge_flags``)."""
    B, C, T = x.shape
    assert (lh is None) == (rh is None) == (edges is None)
    if rh is not None:
        assert rh.shape == (B, C, HALO), (rh.shape, (B, C, HALO))
        x = jnp.concatenate([x, rh.astype(x.dtype)], axis=2)
    if lh is None:
        lh = jnp.zeros((B, C, HALO), x.dtype)
    else:
        lh = lh.astype(x.dtype)
        assert lh.shape == (B, C, HALO), (lh.shape, (B, C, HALO))
    if edges is None:
        bounds = jnp.asarray([0, T], jnp.int32)
    else:
        bounds = jnp.stack([
            jnp.where(edges[0] == 1, 0, -HALO),
            T + jnp.where(edges[1] == 1, 0, HALO)]).astype(jnp.int32)
    Tin = x.shape[2]
    S = TILE
    pad = (-Tin) % S
    xf = jnp.pad(x, ((0, 0), (0, 0), (0, pad))) if pad else x
    NT = (Tin + pad) // S

    # weights pre-transposed to (..., Cout, Cin); vectors pre-shaped as
    # columns (C, 1) — no relayout inside the grid step
    a1 = jnp.stack([u["alpha1"] for u in tail_units])[..., None]  # (3, C, 1)
    w1t = jnp.stack([u["conv1"]["w"] for u in tail_units]) \
        .transpose(0, 1, 3, 2)                                    # (3, 7, C, C)
    b1 = jnp.stack([u["conv1"]["b"] for u in tail_units])[..., None]
    a2 = jnp.stack([u["alpha2"] for u in tail_units])[..., None]
    w2t = jnp.stack([u["conv2"]["w"][0].T for u in tail_units])   # (3, C, C)
    b2 = jnp.stack([u["conv2"]["b"] for u in tail_units])[..., None]
    ao = tail_alpha.reshape(1, -1, 1)
    wot = out_conv["w"].transpose(0, 2, 1)                        # (7, 1, C)
    bo = out_conv["b"].reshape(1, 1)

    def cur_map(b, t):
        return (b, 0, t)

    def prev_map(b, t):
        return (b, 0, jnp.maximum(t - 1, 0))

    def next_map(b, t):
        return (b, 0, jnp.minimum(t + 1, NT - 1))

    xspec = lambda imap: pl.BlockSpec((1, C, S), imap, memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    lhspec = pl.BlockSpec((1, C, HALO), lambda b, t: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    consts = [a1, w1t, b1, a2, w2t, b2, ao, wot, bo]

    kernel = functools.partial(_kernel, n_tiles=NT)
    out = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[xspec(prev_map), xspec(cur_map), xspec(next_map), lhspec,
                  bspec] + [full(a) for a in consts],
        out_specs=pl.BlockSpec((1, 1, S), cur_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, Tin + pad), x.dtype),
        interpret=interpret,
    )(xf, xf, xf, lh, bounds, *consts)
    out = out.reshape(B, Tin + pad, 1)
    return out[:, :T]


@functools.partial(jax.jit, static_argnames=("interpret",))
def legacy_tail(x: jnp.ndarray, tail_units: list, tail_alpha, out_conv, *,
                interpret: bool = False) -> jnp.ndarray:
    """Natural input: x (B, T, C=24) -> (B, T, 1). ``tail_units``: the decoder's
    3 legacy unit param dicts; ``out_conv``: k=7 C->1 conv params."""
    return legacy_tail_ct(x.transpose(0, 2, 1), tail_units, tail_alpha,
                          out_conv, interpret=interpret)
