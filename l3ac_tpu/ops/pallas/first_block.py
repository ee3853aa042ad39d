"""Fused FirstBlock Pallas kernel — transposed (C, T) layout.

The encoder stem (reference ``l3ac/tconv/__init__.py:8-27``) runs at raw audio
rate on a single input channel: 5 parallel [trend-pool -> Conv1d(1->4, k7)]
branches, 1x1 conv 20->80, GELU, concat of the raw channel, 1x1 conv
81->target_dim. In the natural layout that is 35 ms at B=16/10 s — C in {1, 4,
20} wastes almost every lane. This kernel keeps time in lanes: pools are
shifted max/sum chains on (1, S) rows, branch convs are broadcast FMAs, and the
two 1x1 convs are narrow-M matmuls.

Pool-padding semantics match torch exactly (max pads -inf, avg pads zero and
divides by k regardless): for |x| >= 0 a zero-extended max is identical to the
-inf pad, and the max-pool output is re-zeroed outside the true sequence
before the average (torch's avg sees an array that simply ends at T).
Halo = 45//2 (largest pool) + 3 (branch conv) = 25 samples per side.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.tconv import FIRST_BLOCK_POOLS
from . import _math

HALO = max(FIRST_BLOCK_POOLS) // 2 + 3  # 25

# Time-tile length (swept on v5e, r5 tools/sweep_tiles.py; env override for
# hardware sweeps only — trace-time constant)
TILE = int(os.environ.get("L3AC_TPU_FB_TILE", "12288"))


def _shift(a: jnp.ndarray, off: int, out_len: int) -> jnp.ndarray:
    """a[:, off:off+out_len], zero-filled past the end (neutral here)."""
    L = a.shape[1]
    take = min(out_len, max(L - off, 0))
    piece = a[:, off:off + take]
    if take < out_len:
        piece = jnp.pad(piece, ((0, 0), (0, out_len - take)))
    return piece


def _sliding(x: jnp.ndarray, k: int, op, out_len: int) -> jnp.ndarray:
    """out[i] = op-reduction of x[i .. i+k-1], via a doubling pyramid."""
    # pyramid[j][i] = reduction over x[i .. i+2^j-1]
    pyr = [x]
    s = 1
    while s * 2 <= k:
        cur = pyr[-1]
        pyr.append(op(cur, _shift(cur, s, cur.shape[1])))
        s *= 2
    res = None
    off = 0
    rem = k
    for j in range(len(pyr) - 1, -1, -1):
        size = 1 << j
        if rem >= size:
            piece = _shift(pyr[j], off, out_len)
            res = piece if res is None else op(res, piece)
            off += size
            rem -= size
    return res


def _kernel(xp_ref, xc_ref, xn_ref, lh_ref, bounds_ref, wb_ref, bb_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, n_tiles: int, S: int):
    t = pl.program_id(1)
    R = S + 2 * HALO

    prev = xp_ref[0, :, S - HALO:]
    nxt = xn_ref[0, :, :HALO]
    # tile 0's left context: zeros monolithically, the left neighbor's
    # boundary under SP (lh operand); the right halo is appended in-array
    prev = jnp.where(t == 0, lh_ref[0], prev)
    nxt = jnp.where(t == n_tiles - 1, jnp.zeros_like(nxt), nxt)
    x = jnp.concatenate([prev, xc_ref[0], nxt], axis=1).astype(jnp.float32)

    # [lo, hi) valid range: [0, T) monolithically; under SP interior shard
    # edges extend by HALO (real neighbor data), global edges keep zero pads
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1) + (t * S - HALO)
    valid = (cols >= bounds_ref[0]) & (cols < bounds_ref[1])
    x = jnp.where(valid, x, 0.0)

    ax = jnp.abs(x)
    branches = []
    for bi, k in enumerate(FIRST_BLOCK_POOLS):
        if k > 1:
            p = k // 2
            # log-time sliding windows: doubling pyramid + power-of-two
            # decomposition of k (O(log k) shifts instead of O(k)); the zero
            # fill shifted in at the right edge is the neutral element for
            # both ops here (|x| >= 0 max, and sum)
            m = _sliding(jnp.pad(ax, ((0, 0), (p, 0))), k, jnp.maximum, R)
            # torch's avg pool operates on an array that ends at T: re-zero
            # out-of-sequence max outputs before averaging
            m = jnp.where(valid, m, 0.0)
            a = _sliding(jnp.pad(m, ((0, 0), (p, 0))), k, jnp.add,
                         R) * (1.0 / k)
        else:
            a = x
        # branch conv 1 -> 4, k=7, pad 3 (broadcast FMAs over lanes)
        apad = jnp.pad(a, ((0, 0), (3, 3)))
        acc = jnp.broadcast_to(bb_ref[bi].astype(jnp.float32)[:, None], (4, R))
        for kk in range(7):
            acc = acc + wb_ref[bi, kk].astype(jnp.float32)[:, None] * \
                apad[:, kk:kk + R]
        branches.append(acc)

    wdt = w1_ref.dtype
    h = jnp.concatenate(branches, axis=0)                     # (20, R)
    h = jnp.dot(w1_ref[...].T.astype(wdt), h.astype(wdt),
                preferred_element_type=jnp.float32) + \
        b1_ref[0].astype(jnp.float32)[:, None]                # (80, R)
    h = _math.gelu_exact(h)
    h = jnp.concatenate([h.astype(wdt), x.astype(wdt)], axis=0)  # (81, R)
    y = jnp.dot(w2_ref[...].T.astype(wdt), h,
                preferred_element_type=jnp.float32) + \
        b2_ref[0].astype(jnp.float32)[:, None]                # (Cout, R)
    o_ref[0] = y[:, HALO:HALO + S].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def first_block_ct(x: jnp.ndarray, p: dict, *,
                   lh: jnp.ndarray | None = None,
                   rh: jnp.ndarray | None = None,
                   edges: jnp.ndarray | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """x: (B, T, 1) audio -> transposed features (B, target_dim, T). Blocks
    are sliced straight out of the audio row and written into the (B, C, T)
    output by index maps, so the encoder's narrow front section continues in
    the lane-packed layout with no relayout.

    SP: ``lh``/``rh`` are (B, HALO, 1) neighbor audio boundary blocks
    (natural layout, ``parallel.sp.halo_blocks`` on the audio) and ``edges``
    the (2,) int32 [is_first_shard, is_last_shard] pair."""
    B, T, _ = x.shape
    assert (lh is None) == (rh is None) == (edges is None)
    Cout = p["conv2"]["w"].shape[2]
    S = TILE
    xr = x.reshape(B, 1, T)
    if rh is not None:
        assert rh.shape == (B, HALO, 1), (rh.shape, (B, HALO, 1))
        xr = jnp.concatenate([xr, rh.astype(x.dtype).reshape(B, 1, HALO)],
                             axis=2)
    if lh is None:
        lh = jnp.zeros((B, 1, HALO), x.dtype)
    else:
        assert lh.shape == (B, HALO, 1), (lh.shape, (B, HALO, 1))
        lh = lh.astype(x.dtype).reshape(B, 1, HALO)
    if edges is None:
        bounds = jnp.asarray([0, T], jnp.int32)
    else:
        bounds = jnp.stack([
            jnp.where(edges[0] == 1, 0, -HALO),
            T + jnp.where(edges[1] == 1, 0, HALO)]).astype(jnp.int32)
    Tin = xr.shape[2]
    pad = (-Tin) % S
    xf = jnp.pad(xr, ((0, 0), (0, 0), (0, pad))) if pad else xr
    NT = (Tin + pad) // S

    wb = jnp.stack([br["w"][:, 0, :] for br in p["base"]["branches"]])  # (5,7,4)
    bb = jnp.stack([br["b"] for br in p["base"]["branches"]])           # (5,4)
    w1 = p["conv1"]["w"][0]                                             # (20,80)
    b1 = p["conv1"]["b"].reshape(1, -1)
    w2 = p["conv2"]["w"][0]                                             # (81,Cout)
    b2 = p["conv2"]["b"].reshape(1, -1)

    def cur_map(b, t):
        return (b, 0, t)

    def prev_map(b, t):
        return (b, 0, jnp.maximum(t - 1, 0))

    def next_map(b, t):
        return (b, 0, jnp.minimum(t + 1, NT - 1))

    xspec = lambda imap: pl.BlockSpec((1, 1, S), imap, memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    lhspec = pl.BlockSpec((1, 1, HALO), lambda b, t: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    consts = [wb, bb, w1, b1, w2, b2]

    kernel = functools.partial(_kernel, n_tiles=NT, S=S)
    out = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[xspec(prev_map), xspec(cur_map), xspec(next_map), lhspec,
                  bspec] + [full(a) for a in consts],
        out_specs=pl.BlockSpec((1, Cout, S), cur_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cout, Tin + pad), x.dtype),
        interpret=interpret,
    )(xf, xf, xf, lh, bounds, *consts)
    return out[:, :, :T]


@functools.partial(jax.jit, static_argnames=("interpret",))
def first_block(x: jnp.ndarray, p: dict, *, interpret: bool = False) -> jnp.ndarray:
    """x: (B, T, 1) audio -> (B, T, target_dim). ``p``: FirstBlock params."""
    return first_block_ct(x, p, interpret=interpret).transpose(0, 2, 1)
