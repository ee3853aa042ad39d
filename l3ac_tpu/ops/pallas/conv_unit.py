"""Fused ConvUnit Pallas kernel — the workhorse block of both conv stacks.

One grid step processes one (batch, time-tile) and runs the whole residual
ConvUnit (reference ``l3ac/modules.py:32-41``) in VMEM:

    dwConv7 -> ChannelNorm -> Linear(C->4C) -> Snake -> GRN -> Linear(4C->C) -> +x

The jnp path does ~10 HBM round-trips over the activation; this kernel does
one read + one write. Time halos (3*dilation per side for the k=7 depthwise
conv) come from neighbor tiles via clamped block indices, zero-masked at the
sequence edges (matching the conv's zero padding).

GRN note: the reference's per-batch scalar norm gives ``n = g/(g+eps)`` with
``1-n = eps/(g+eps) <= 1e-8/g`` — indistinguishable from 1 in fp32 for any
non-degenerate activation (and exactly harmless when x == 0). The kernel uses
``n = 1`` (y = gamma*x + beta + x), which removes the only cross-tile
dependency; the jnp reference keeps the exact form, and parity tests bound the
difference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _math

# Transposed-kernel time-tile budget: bytes allowed for the (4C, S) fp32
# intermediate. Swept on v5e (r5, tools/sweep_tiles.py); env override is for
# hardware sweeps only (trace-time constant).
CT_BUDGET = int(os.environ.get("L3AC_TPU_CU_BUDGET", str(2 << 20)))
CT_CAP = int(os.environ.get("L3AC_TPU_CU_CAP", "6144"))
NAT_BUDGET = int(os.environ.get("L3AC_TPU_CU_NAT_BUDGET", str(2 << 20)))


def _kernel(xp_ref, xc_ref, xn_ref, lh_ref, dww_ref, dwb_ref, nw_ref, nb_ref,
            w1_ref, b1_ref, alpha_ref, w2_ref, b2_ref,
            o_ref, *, halo: int, kernel_size: int, dilation: int,
            has_norm: bool, has_snake: bool, n_tiles: int):
    t = pl.program_id(1)
    S = xc_ref.shape[1]
    C = xc_ref.shape[2]

    xc = xc_ref[0]
    prev = xp_ref[0, S - halo:, :]
    nxt = xn_ref[0, :halo, :]
    # tile 0's left context comes from the lh operand: zeros in the monolithic
    # case (the conv's zero padding), the left neighbor's boundary under SP.
    # The right halo is appended to the input array by the wrapper, so the
    # last tile's next-slot is always past the end -> zeros.
    prev = jnp.where(t == 0, lh_ref[0], prev)
    nxt = jnp.where(t == n_tiles - 1, jnp.zeros_like(nxt), nxt)
    xpad = jnp.concatenate([prev, xc, nxt], axis=0)      # (S + 2*halo, C)

    # depthwise conv as kernel_size shifted FMAs (VPU), fp32 accumulate
    acc = jnp.broadcast_to(dwb_ref[0], (S, C)).astype(jnp.float32)
    for k in range(kernel_size):
        off = k * dilation
        acc = acc + xpad[off:off + S, :].astype(jnp.float32) * \
            dww_ref[k].astype(jnp.float32)

    if has_norm:
        u = jnp.mean(acc, axis=-1, keepdims=True)
        s = jnp.mean((acc - u) ** 2, axis=-1, keepdims=True)
        acc = (acc - u) * jax.lax.rsqrt(s + 1e-8)
        acc = acc * nw_ref[0].astype(jnp.float32) + nb_ref[0].astype(jnp.float32)

    h = jnp.dot(acc.astype(w1_ref.dtype), w1_ref[...],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)

    if has_snake:
        h = _math.snake(h, alpha_ref[0])
    else:
        h = _math.gelu_exact(h)

    # GRN (n = 1, see module docstring) is folded into w2/b2 by the wrapper:
    # W2 @ (gamma*h + beta + h) == ((1+gamma) scaled W2) @ h + (W2-projected
    # beta) — two fewer full-size VPU passes over the (S, 4C) intermediate.
    y = jnp.dot(h.astype(w2_ref.dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (xc.astype(jnp.float32) + y).astype(o_ref.dtype)


def _kernel_t(xp_ref, xc_ref, xn_ref, lh_ref, dww_ref, dwb_ref, nw_ref, nb_ref,
              w1t_ref, b1_ref, alpha_ref, w2t_ref, b2_ref,
              o_ref, *, halo: int, kernel_size: int, dilation: int,
              has_norm: bool, has_snake: bool, n_tiles: int):
    """Transposed (C, T) variant for narrow channel counts: time in lanes,
    channels in sublanes; dw conv = shifted FMAs, norm = sublane reduction,
    pointwise convs = narrow-M matmuls (same rationale as legacy_tail).

    Weights arrive pre-transposed ((Cout, Cin)) and vectors pre-shaped as
    columns ((C, 1)) so no relayout happens inside the grid step; matmuls run
    in the parameter dtype (bf16 in production) with fp32 accumulation.
    """
    t = pl.program_id(1)
    C = xc_ref.shape[1]
    S = xc_ref.shape[2]

    prev = xp_ref[0, :, S - halo:]
    nxt = xn_ref[0, :, :halo]
    prev = jnp.where(t == 0, lh_ref[0], prev)
    nxt = jnp.where(t == n_tiles - 1, jnp.zeros_like(nxt), nxt)
    xpad = jnp.concatenate([prev, xc_ref[0], nxt], axis=1)

    acc = jnp.broadcast_to(dwb_ref[...].astype(jnp.float32), (C, S))
    for k in range(kernel_size):
        off = k * dilation
        acc = acc + xpad[:, off:off + S].astype(jnp.float32) * \
            dww_ref[:, k:k + 1].astype(jnp.float32)

    if has_norm:
        u = jnp.mean(acc, axis=0, keepdims=True)
        s = jnp.mean((acc - u) ** 2, axis=0, keepdims=True)
        acc = (acc - u) * jax.lax.rsqrt(s + 1e-8)
        acc = acc * nw_ref[...].astype(jnp.float32) + \
            nb_ref[...].astype(jnp.float32)

    h = jnp.dot(w1t_ref[...], acc.astype(w1t_ref.dtype),
                preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)

    if has_snake:
        h = _math.snake(h, alpha_ref[...])
    else:
        h = _math.gelu_exact(h)

    # GRN folded into w2t/b2 at trace time (see _kernel)
    y = jnp.dot(w2t_ref[...], h.astype(w2t_ref.dtype),
                preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    o_ref[0] = (xpad[:, halo:halo + S].astype(jnp.float32) + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilation",
                                             "interpret"))
def conv_unit_ct(x: jnp.ndarray, p: dict, *, kernel_size: int = 7,
                 dilation: int = 1, lh: jnp.ndarray | None = None,
                 rh: jnp.ndarray | None = None,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused residual ConvUnit on transposed (B, C, T) activations — the
    narrow-channel layout. Blocks are sliced straight out of the (B, C, T)
    array by index maps: no flatten/relayout on either side, so chained
    narrow-section ops stay lane-packed end to end.

    ``lh``/``rh``: optional (B, C, halo) sequence-parallel halo blocks
    (``parallel.sp.halo_blocks``) — the neighbor shards' boundary data.
    Omitted: zero padding at both edges (monolithic semantics)."""
    B, C, T = x.shape
    has_norm = "norm" in p
    has_snake = "alpha" in p
    halo = (kernel_size - 1) * dilation // 2
    if rh is not None:
        # appended in-array so reads past T stay contiguous mid-block
        assert rh.shape == (B, C, halo), (rh.shape, (B, C, halo))
        x = jnp.concatenate([x, rh.astype(x.dtype)], axis=2)
    if lh is None:
        lh = jnp.zeros((B, C, halo), x.dtype)
    else:
        assert lh.shape == (B, C, halo), (lh.shape, (B, C, halo))
        lh = lh.astype(x.dtype)
    Tin = x.shape[2]
    # keep the (4C, S) fp32 intermediate bounded (VMEM scoped limit is 16 MiB
    # shared with double-buffered I/O blocks and both weight matrices); narrow
    # channels take long tiles — fewer grid steps amortize per-step overhead.
    # Budget is C-dependent (r5 sweep, post-GRN-fold): C=96 measures best at
    # 4 MiB (0.997 vs 1.122 ms/unit at the stage-2 shape) while C<=48 and the
    # encoder's C=24 measure best at 2 MiB (8 MiB OOMs scoped VMEM).
    budget = CT_BUDGET if C < 96 else max(CT_BUDGET, 4 << 20)
    S = max(256, min(CT_CAP, (budget // (16 * C)) // 256 * 256))
    pad = (-Tin) % S
    xt = jnp.pad(x, ((0, 0), (0, 0), (0, pad))) if pad else x
    NT = (Tin + pad) // S
    assert halo <= S

    dww = p["dw"]["w"].reshape(kernel_size, C).T            # (C, K)
    col = lambda v: v.reshape(-1, 1)
    # GRN (n = 1) folded into the second pointwise conv at trace time:
    # W2 @ (g*h + b + h) == (W2 * (1+g)) @ h + W2 @ b  (fp32, then cast to
    # the parameter dtype — removes two full-size VPU passes in the kernel)
    gam = p["grn"]["gamma"].astype(jnp.float32)
    bet = p["grn"]["beta"].astype(jnp.float32)
    w2f = p["pw2"]["w"].astype(jnp.float32)                 # (4C, C)
    w2 = (w2f * (1.0 + gam)[:, None]).astype(p["pw2"]["w"].dtype)
    b2 = p["pw2"]["b"].astype(jnp.float32) + bet @ w2f
    args = [
        xt, xt, xt, lh, dww, col(p["dw"]["b"]),
        col(p["norm"]["w"]) if has_norm else col(jnp.zeros((C,), x.dtype)),
        col(p["norm"]["b"]) if has_norm else col(jnp.zeros((C,), x.dtype)),
        p["pw1"]["w"].T, col(p["pw1"]["b"]),
        col(p["alpha"]) if has_snake else col(jnp.zeros((4 * C,), x.dtype)),
        w2.T, col(b2.astype(p["pw2"]["b"].dtype)),
    ]

    def cur_map(b, t):
        return (b, 0, t)

    def prev_map(b, t):
        return (b, 0, jnp.maximum(t - 1, 0))

    def next_map(b, t):
        return (b, 0, jnp.minimum(t + 1, NT - 1))

    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    xspec = lambda imap: pl.BlockSpec((1, C, S), imap, memory_space=pltpu.VMEM)
    lhspec = pl.BlockSpec((1, C, halo), lambda b, t: (b, 0, 0),
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel_t, halo=halo, kernel_size=kernel_size, dilation=dilation,
        has_norm=has_norm, has_snake=has_snake, n_tiles=NT)
    out = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[xspec(prev_map), xspec(cur_map), xspec(next_map), lhspec] +
                 [full(a) for a in args[4:]],
        out_specs=xspec(cur_map),
        out_shape=jax.ShapeDtypeStruct((B, C, Tin + pad), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :, :T]


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilation",
                                             "interpret"))
def conv_unit_t(x: jnp.ndarray, p: dict, *, kernel_size: int = 7,
                dilation: int = 1, lh: jnp.ndarray | None = None,
                rh: jnp.ndarray | None = None,
                interpret: bool = False) -> jnp.ndarray:
    """Fused residual ConvUnit for natural (B, T, C) input with narrow C:
    transpose, run :func:`conv_unit_ct`, transpose back. Callers that already
    hold (B, C, T) activations should call ``conv_unit_ct`` directly.
    ``lh``/``rh``: natural-layout (B, halo, C) SP halo blocks."""
    tr = lambda a: None if a is None else a.transpose(0, 2, 1)
    out = conv_unit_ct(x.transpose(0, 2, 1), p, kernel_size=kernel_size,
                       dilation=dilation, lh=tr(lh), rh=tr(rh),
                       interpret=interpret)
    return out.transpose(0, 2, 1)


def _tile_size(C: int) -> int:
    # keep the (S, 4C) fp32 intermediate ~NAT_BUDGET (swept r5)
    target = NAT_BUDGET // (16 * C)
    S = 128
    while S * 2 <= min(8192, target):
        S *= 2
    return S


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilation",
                                             "interpret"))
def conv_unit(x: jnp.ndarray, p: dict, *, kernel_size: int = 7,
              dilation: int = 1, lh: jnp.ndarray | None = None,
              rh: jnp.ndarray | None = None,
              interpret: bool = False) -> jnp.ndarray:
    """Fused residual ConvUnit. x: (B, T, C); p: ConvUnit param dict (dense
    weights — int8-quantized leaves fall back to the jnp path upstream).
    ``lh``/``rh``: optional (B, halo, C) SP halo blocks (see conv_unit_ct)."""
    B, T, C = x.shape
    has_norm = "norm" in p
    has_snake = "alpha" in p
    halo = (kernel_size - 1) * dilation // 2
    if rh is not None:
        assert rh.shape == (B, halo, C), (rh.shape, (B, halo, C))
        x = jnp.concatenate([x, rh.astype(x.dtype)], axis=1)
    if lh is None:
        lh = jnp.zeros((B, halo, C), x.dtype)
    else:
        assert lh.shape == (B, halo, C), (lh.shape, (B, halo, C))
        lh = lh.astype(x.dtype)
    Tin = x.shape[1]

    S = _tile_size(C)
    pad = (-Tin) % S
    xt = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    NT = (Tin + pad) // S
    assert halo <= S
    xf = xt.reshape(B * NT, S, C)

    dww = p["dw"]["w"].reshape(kernel_size, C)           # (K,1,C) -> (K,C)
    row = lambda v: v.reshape(1, -1)
    # GRN fold (see conv_unit_ct)
    gam = p["grn"]["gamma"].astype(jnp.float32)
    bet = p["grn"]["beta"].astype(jnp.float32)
    w2f = p["pw2"]["w"].astype(jnp.float32)              # (4C, C)
    w2 = (w2f * (1.0 + gam)[:, None]).astype(p["pw2"]["w"].dtype)
    b2 = p["pw2"]["b"].astype(jnp.float32) + bet @ w2f
    args = [
        xf, xf, xf, lh, dww, row(p["dw"]["b"]),
        row(p["norm"]["w"]) if has_norm else row(jnp.zeros((C,), x.dtype)),
        row(p["norm"]["b"]) if has_norm else row(jnp.zeros((C,), x.dtype)),
        p["pw1"]["w"], row(p["pw1"]["b"]),
        row(p["alpha"]) if has_snake else row(jnp.zeros((4 * C,), x.dtype)),
        w2, row(b2.astype(p["pw2"]["b"].dtype)),
    ]

    def cur_map(b, t):
        return (b * NT + t, 0, 0)

    def prev_map(b, t):
        return (b * NT + jnp.maximum(t - 1, 0), 0, 0)

    def next_map(b, t):
        return (b * NT + jnp.minimum(t + 1, NT - 1), 0, 0)

    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    xspec = lambda imap: pl.BlockSpec((1, S, C), imap, memory_space=pltpu.VMEM)
    lhspec = pl.BlockSpec((1, halo, C), lambda b, t: (b, 0, 0),
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, halo=halo, kernel_size=kernel_size, dilation=dilation,
        has_norm=has_norm, has_snake=has_snake, n_tiles=NT)

    out = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[xspec(prev_map), xspec(cur_map), xspec(next_map), lhspec] +
                 [full(a) for a in args[4:]],
        out_specs=xspec(cur_map),
        out_shape=jax.ShapeDtypeStruct((B * NT, S, C), x.dtype),
        interpret=interpret,
    )(*args)
    out = out.reshape(B, Tin + pad, C)
    return out[:, :T]
