"""Fused decoder up-path kernel: 1x1 conv -> linear upsample -> ChannelNorm.

The reference's up path (``l3ac/modules.py:155-166``: Conv1d(k=1) +
nn.Upsample(mode='linear', align_corners=False) + optional ChannelNorm) is
three XLA ops and ~5 HBM passes over near-audio-rate activations; measured
4.9 ms of the 1kbps decoder's 19 ms (tools/bench_up.py) against a ~0.4 ms
HBM floor. This kernel runs the whole chain in VMEM.

Key design point — phase-split outputs: Mosaic cannot interleave along the
minor (lane) dimension (strided stores and minor-dim reshape merges both fail
to legalize), so the kernel does NOT produce the interleaved (.., T*s) array.
Instead it exploits that ChannelNorm is per-(batch, time-position) and the
upsample phases have constant weights: phase p of the output,
``out[.., t*s + p]``, depends only on ``z[t-1..t+1]`` where ``z = W^T x + b``,
and can be normalized independently. So one grid step emits ``s`` separate
fully-finished phase arrays, and a single XLA stack+reshape performs the
interleave — the only HBM round-trip besides reading x and writing out.

Edge semantics are torch's align_corners=False source-index clamp: the
out-of-range neighbor at the global sequence edges is the edge frame itself
(NOT zero). Under sequence parallelism the wrapper passes neighbor-shard
boundary columns as ``lh``/``rh`` (see ``models/decoder._up_path``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile budget/cap knobs (r5 hardware sweeps, tools/sweep_tiles.py; trace-time
# constants — env override is for sweep subprocesses only)
# NOTE: an 8 MiB budget measured faster in ISOLATION at the stage-2 shape
# (0.83 -> 0.46 ms) but 0.3 ms SLOWER end-to-end (bench.py A/B, r5) — tile
# choices interact with neighboring kernels' residency; whole-step A/B is
# the deciding measurement.
UP_BUDGET = int(os.environ.get("L3AC_TPU_UP_BUDGET", str(2 << 20)))
UP_CAP = int(os.environ.get("L3AC_TPU_UP_CAP", "6144"))


def _phase_weights(scale: int):
    """Per-phase (w_prev, w_cur, w_next) taps of torch's linear upsample."""
    taps = []
    for p in range(scale):
        d = (p + 0.5) / scale - 0.5
        if d >= 0:
            taps.append((0.0, 1.0 - d, d))
        else:
            taps.append((-d, 1.0 + d, 0.0))
    return taps


def _kernel_ct(xc_ref, lb_ref, rb_ref, wt_ref, b_ref, nw_ref, nb_ref,
               *o_refs, scale: int, has_norm: bool, n_tiles: int):
    # lb/rb: (B, Ci, NT) per-tile out-of-tile boundary columns, precomputed
    # by the wrapper (strided slice) — avoids fetching whole neighbor blocks
    t = pl.program_id(1)
    S = xc_ref.shape[2]
    # select this tile's boundary columns with a masked sum (a dynamic lane
    # slice would need a provably-128-aligned index, which t is not)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, n_tiles), 1) == t)
    lb = jnp.sum(jnp.where(sel, lb_ref[0].astype(jnp.float32), 0.0),
                 axis=1, keepdims=True).astype(xc_ref.dtype)
    rb = jnp.sum(jnp.where(sel, rb_ref[0].astype(jnp.float32), 0.0),
                 axis=1, keepdims=True).astype(xc_ref.dtype)
    xpad = jnp.concatenate([lb, xc_ref[0], rb], axis=1)      # (Ci, S+2)

    z = jnp.dot(wt_ref[...], xpad.astype(wt_ref.dtype),
                preferred_element_type=jnp.float32)
    z = z + b_ref[...].astype(jnp.float32)                    # (Co, S+2)

    for p, (wp, wc, wn) in enumerate(_phase_weights(scale)):
        y = z[:, 1:S + 1] * wc
        if wp:
            y = y + z[:, 0:S] * wp
        if wn:
            y = y + z[:, 2:S + 2] * wn
        if has_norm:
            u = jnp.mean(y, axis=0, keepdims=True)
            v = jnp.mean((y - u) ** 2, axis=0, keepdims=True)
            y = (y - u) * jax.lax.rsqrt(v + 1e-8)
            y = y * nw_ref[...].astype(jnp.float32) + \
                nb_ref[...].astype(jnp.float32)
        o_refs[p][0] = y.astype(o_refs[p].dtype)


def _kernel(xc_ref, lb_ref, rb_ref, w_ref, b_ref, nw_ref, nb_ref,
            *o_refs, scale: int, has_norm: bool, n_tiles: int):
    t = pl.program_id(1)
    S = xc_ref.shape[1]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (n_tiles, 1), 0) == t)
    lb = jnp.sum(jnp.where(sel, lb_ref[0].astype(jnp.float32), 0.0),
                 axis=0, keepdims=True).astype(xc_ref.dtype)
    rb = jnp.sum(jnp.where(sel, rb_ref[0].astype(jnp.float32), 0.0),
                 axis=0, keepdims=True).astype(xc_ref.dtype)
    xpad = jnp.concatenate([lb, xc_ref[0], rb], axis=0)      # (S+2, Ci)

    z = jnp.dot(xpad.astype(w_ref.dtype), w_ref[...],
                preferred_element_type=jnp.float32)
    z = z + b_ref[0].astype(jnp.float32)                      # (S+2, Co)

    for p, (wp, wc, wn) in enumerate(_phase_weights(scale)):
        y = z[1:S + 1, :] * wc
        if wp:
            y = y + z[0:S, :] * wp
        if wn:
            y = y + z[2:S + 2, :] * wn
        if has_norm:
            u = jnp.mean(y, axis=-1, keepdims=True)
            v = jnp.mean((y - u) ** 2, axis=-1, keepdims=True)
            y = (y - u) * jax.lax.rsqrt(v + 1e-8)
            y = y * nw_ref[0].astype(jnp.float32) + \
                nb_ref[0].astype(jnp.float32)
        o_refs[p][0] = y.astype(o_refs[p].dtype)


def _edge_cols(x, axis):
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    return first, last


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "phase_split"))
def up_fused_ct(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                nw: jnp.ndarray | None, nb: jnp.ndarray | None, *,
                scale: int, lh: jnp.ndarray | None = None,
                rh: jnp.ndarray | None = None,
                interpret: bool = False, phase_split: bool = False):
    """Transposed layout: x (B, Ci, T) -> (B, Co, T*scale).

    ``w``: (1, Ci, Co) conv weight, ``b``: (Co,). ``nw``/``nb``: ChannelNorm
    params or None. ``lh``/``rh``: (B, Ci, 1) neighbor boundary columns
    (sequence parallelism); None -> global edge clamp (own edge column).

    ``phase_split=True`` returns the ``scale`` finished phase arrays
    (each (B, Co, T), ``out[.., t*scale + p] == phases[p][.., t]``) WITHOUT
    the lane-interleave stack — for consumers that can eat the polyphase
    layout directly (``legacy_tail.legacy_tail_poly_ct``), deleting the
    interleave relayout and its re-read.
    """
    B, Ci, T = x.shape
    Co = w.shape[2]
    has_norm = nw is not None
    first, last = _edge_cols(x, 2)
    if lh is None:
        lh = first
    if rh is None:
        rh = last
    # append the right neighbor in-array; edge-pad so the positions past T
    # (discarded after the final slice) never read garbage
    xext = jnp.concatenate([x, rh.astype(x.dtype)], axis=2)
    # r5 sweep: the phase-split form (narrow stage-3 shapes) measured fastest
    # at the smaller tile, the interleaved form at the larger one
    budget, cap = ((2 << 20, 6144) if phase_split else (UP_BUDGET, UP_CAP))
    S = max(256, min(cap, (budget // (16 * max(Ci, Co))) // 256 * 256))
    pad = (-xext.shape[2]) % S
    if pad:
        xext = jnp.concatenate(
            [xext, jnp.broadcast_to(last.astype(x.dtype), (B, Ci, pad))],
            axis=2)
    NT = xext.shape[2] // S

    # per-tile out-of-tile boundary columns, gathered once by strided slice:
    # left of tile t = col t*S-1 (tile 0: lh), right = col (t+1)*S (last
    # tile: unused — any value; clamp keeps it finite)
    lcols = xext[:, :, S - 1::S][:, :, :NT - 1]
    lb_all = jnp.concatenate([lh.astype(x.dtype), lcols], axis=2)
    rcols = xext[:, :, S::S][:, :, :NT - 1]
    rb_all = jnp.concatenate([rcols, last.astype(x.dtype)], axis=2)

    col = lambda v: v.reshape(-1, 1)
    zcol = col(jnp.zeros((Co,), x.dtype))
    args = [xext, lb_all, rb_all, w[0].T, col(b),
            col(nw) if has_norm else zcol, col(nb) if has_norm else zcol]

    full = lambda arr: pl.BlockSpec(arr.shape, lambda bb, tt: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, Co, S), lambda bb, tt: (bb, 0, tt),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, Ci, NT), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_ct, scale=scale, has_norm=has_norm,
                               n_tiles=NT)
    outs = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[pl.BlockSpec((1, Ci, S), lambda bb, tt: (bb, 0, tt),
                               memory_space=pltpu.VMEM),
                  bspec, bspec] + [full(a) for a in args[3:]],
        out_specs=[ospec] * scale,
        out_shape=[jax.ShapeDtypeStruct((B, Co, NT * S), x.dtype)] * scale,
        interpret=interpret,
    )(*args)
    if phase_split:
        return tuple(o[:, :, :T] for o in outs)
    out = jnp.stack(outs, axis=3).reshape(B, Co, NT * S * scale)
    return out[:, :, :T * scale]


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def up_fused(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
             nw: jnp.ndarray | None, nb: jnp.ndarray | None, *,
             scale: int, lh: jnp.ndarray | None = None,
             rh: jnp.ndarray | None = None,
             interpret: bool = False) -> jnp.ndarray:
    """Natural layout: x (B, T, Ci) -> (B, T*scale, Co). Params as in
    :func:`up_fused_ct`; ``lh``/``rh``: (B, 1, Ci)."""
    B, T, Ci = x.shape
    Co = w.shape[2]
    has_norm = nw is not None
    first, last = _edge_cols(x, 1)
    if lh is None:
        lh = first
    if rh is None:
        rh = last
    xext = jnp.concatenate([x, rh.astype(x.dtype)], axis=1)
    S = max(256, min(UP_CAP, (UP_BUDGET // (16 * max(Ci, Co))) // 256 * 256))
    pad = (-xext.shape[1]) % S
    if pad:
        xext = jnp.concatenate(
            [xext, jnp.broadcast_to(last.astype(x.dtype), (B, pad, Ci))],
            axis=1)
    NT = xext.shape[1] // S

    lrows = xext[:, S - 1::S][:, :NT - 1]
    lb_all = jnp.concatenate([lh.astype(x.dtype), lrows], axis=1)
    rrows = xext[:, S::S][:, :NT - 1]
    rb_all = jnp.concatenate([rrows, last.astype(x.dtype)], axis=1)

    row = lambda v: v.reshape(1, -1)
    zrow = row(jnp.zeros((Co,), x.dtype))
    args = [xext, lb_all, rb_all, w[0], row(b),
            row(nw) if has_norm else zrow, row(nb) if has_norm else zrow]

    full = lambda arr: pl.BlockSpec(arr.shape, lambda bb, tt: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, S, Co), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, NT, Ci), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, scale=scale, has_norm=has_norm,
                               n_tiles=NT)
    outs = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[pl.BlockSpec((1, S, Ci), lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
                  bspec, bspec] + [full(a) for a in args[3:]],
        out_specs=[ospec] * scale,
        out_shape=[jax.ShapeDtypeStruct((B, NT * S, Co), x.dtype)] * scale,
        interpret=interpret,
    )(*args)
    out = jnp.stack(outs, axis=2).reshape(B, NT * S * scale, Co)
    return out[:, :T * scale]
