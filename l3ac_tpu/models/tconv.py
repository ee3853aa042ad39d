"""Trend-conv stem and gating blocks (reference ``l3ac/tconv/``).

- BaseBlock: parallel [TrendPool(pk) -> Conv1d(1 -> target_dim/len, k=ck,
  dil=pk//dilation_rate+1, centered pad)] branches, channel-concat
  (``l3ac/tconv/base.py:27-45``).
- FirstBlock (= V3FirstBlock with dilation_rate=99 so all dilations are 1):
  BaseBlock(h=20, pk=(1,5,11,21,45)) -> 1x1 Conv(20->80) -> GELU -> concat raw
  input channel -> 1x1 Conv(81->target_dim) (``l3ac/tconv/__init__.py:8-27``).
- EnhanceBlock: BaseBlock(4, pk=(1,3,5,9), dils (1,2,3,5)) on **channel 0
  only**, merged through InstanceNorm1d(4, affine) + plain Conv1d(4->dim, k=1),
  output ``x + y*x`` (multiplicative gate, ``l3ac/tconv/__init__.py:30-44``).
"""

import jax
import jax.numpy as jnp

from ..ops import conv1d, trend_pool, gelu, instance_norm
from ..utils import init as pinit


def _branch_meta(conv_kernels, pool_kernels, dilation_rate):
    metas = []
    for ck, pk in zip(conv_kernels, pool_kernels):
        dil = pk // dilation_rate + 1
        metas.append({"pool_k": pk, "conv_k": ck, "dilation": dil,
                      "padding": (ck - 1) * dil // 2})
    return metas


def init_base_block(key, target_dim: int, conv_kernels=(7, 7, 7, 7),
                    pool_kernels=(1, 3, 5, 9), dilation_rate=2,
                    dtype=jnp.float32) -> dict:
    assert target_dim % len(pool_kernels) == 0
    each = target_dim // len(pool_kernels)
    keys = jax.random.split(key, len(pool_kernels))
    metas = _branch_meta(conv_kernels, pool_kernels, dilation_rate)
    return {"branches": [pinit.conv_params(k, m["conv_k"], 1, each, dtype=dtype)
                         for k, m in zip(keys, metas)]}


def base_block_apply(p: dict, x: jnp.ndarray, conv_kernels=(7, 7, 7, 7),
                     pool_kernels=(1, 3, 5, 9), dilation_rate=2) -> jnp.ndarray:
    """x: (B, T, 1) -> (B, T, target_dim)."""
    metas = _branch_meta(conv_kernels, pool_kernels, dilation_rate)
    outs = []
    for bp, m in zip(p["branches"], metas):
        h = trend_pool(x, m["pool_k"])
        h = conv1d(h, bp["w"], bp["b"], padding=m["padding"], dilation=m["dilation"])
        outs.append(h)
    return jnp.concatenate(outs, axis=-1)


FIRST_BLOCK_POOLS = (1, 5, 11, 21, 45)
FIRST_BLOCK_CONVS = (7, 7, 7, 7, 7)
FIRST_BLOCK_DILATION_RATE = 99  # all dilations collapse to 1


def init_first_block(key, target_dim: int, dtype=jnp.float32) -> dict:
    h_dim = len(FIRST_BLOCK_POOLS) * 4  # 20
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "base": init_base_block(k0, h_dim, FIRST_BLOCK_CONVS, FIRST_BLOCK_POOLS,
                                FIRST_BLOCK_DILATION_RATE, dtype),
        "conv1": pinit.conv_params(k1, 1, h_dim, h_dim * 4, dtype=dtype),
        "conv2": pinit.conv_params(k2, 1, h_dim * 4 + 1, target_dim, dtype=dtype),
    }


def first_block_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, 1) audio -> (B, T, target_dim) features."""
    h = base_block_apply(p["base"], x, FIRST_BLOCK_CONVS, FIRST_BLOCK_POOLS,
                         FIRST_BLOCK_DILATION_RATE)
    h = conv1d(h, p["conv1"]["w"], p["conv1"]["b"])
    h = gelu(h)
    y = jnp.concatenate([h, x], axis=-1)
    return conv1d(y, p["conv2"]["w"], p["conv2"]["b"])


ENHANCE_POOLS = (1, 3, 5, 9)
ENHANCE_CONVS = (7, 7, 7, 7)
ENHANCE_DILATION_RATE = 2


def init_enhance_block(key, dim: int, dtype=jnp.float32) -> dict:
    k0, k1 = jax.random.split(key)
    return {
        "base": init_base_block(k0, 4, ENHANCE_CONVS, ENHANCE_POOLS,
                                ENHANCE_DILATION_RATE, dtype),
        "in_norm": pinit.norm_params(4, dtype),
        # plain (non-weight-normed) torch Conv1d
        "merge": pinit.torch_conv_params(k1, 1, 4, dim, dtype=dtype),
    }


def enhance_block_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T, C); gate computed from channel 0 only.

    Convs written as shifted FMAs / broadcasts (not ``lax.conv``): the gate
    pipeline has 1-4 channels, where conv lowering wastes nearly every lane.
    """
    from ..ops import trend_pool
    from ..parallel import sp
    xi = x[..., :1]
    T = x.shape[1]
    metas = _branch_meta(ENHANCE_CONVS, ENHANCE_POOLS, ENHANCE_DILATION_RATE)
    outs = []
    for bp, m in zip(p["base"]["branches"], metas):
        h = trend_pool(xi, m["pool_k"])
        d, pad = m["dilation"], m["padding"]
        hp = sp.pad_time(h, pad, pad, axis=1)
        w = bp["w"]  # (7, 1, 1)
        acc = bp["b"][0] + w[0, 0, 0] * hp[:, :T, :]
        for k in range(1, w.shape[0]):
            acc = acc + w[k, 0, 0] * hp[:, k * d:k * d + T, :]
        outs.append(acc)
    y = jnp.concatenate(outs, axis=-1)                        # (B, T, 4)
    y = instance_norm(y, p["in_norm"]["w"], p["in_norm"]["b"])
    # merge 1x1 conv (4 -> C) as 4 broadcast FMAs; gate applied as x * (1 + g)
    wm = p["merge"]["w"][0]                                   # (4, C)
    g = p["merge"]["b"] + y[..., 0:1] * wm[0]
    for f in range(1, wm.shape[0]):
        g = g + y[..., f:f + 1] * wm[f]
    return x * (1.0 + g)


def enhance_block_apply_t(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """EnhanceBlock on transposed (B, C, T) activations: the channel-0 gather is
    a sublane row, the 4-channel gate pipeline runs lane-packed.

    Every conv here is written as shifted fused-multiply-adds / broadcasts
    rather than ``lax.conv``/``einsum``: XLA lowers both badly when the
    contraction is over 1-4 sublane channels (measured ~100x slower than the
    FMA form at decoder stage-3 shapes).
    """
    from ..ops import transposed as tx
    from ..parallel import sp
    xi = x[:, :1, :]
    T = x.shape[2]
    metas = _branch_meta(ENHANCE_CONVS, ENHANCE_POOLS, ENHANCE_DILATION_RATE)
    outs = []
    for bp, m in zip(p["base"]["branches"], metas):
        h = tx.trend_pool_t(xi, m["pool_k"])
        # conv 1 -> 1, k=7, dilated: 7 shifted FMAs on the (B, 1, T) row
        d, pad = m["dilation"], m["padding"]
        hp = sp.pad_time(h, pad, pad, axis=2)
        w = bp["w"]  # (7, 1, 1)
        acc = bp["b"][0] + w[0, 0, 0] * hp[:, :, :T]
        for k in range(1, w.shape[0]):
            acc = acc + w[k, 0, 0] * hp[:, :, k * d:k * d + T]
        outs.append(acc)
    y = jnp.concatenate(outs, axis=1)                        # (B, 4, T)
    y = tx.instance_norm_t(y, p["in_norm"]["w"], p["in_norm"]["b"])
    # merge 1x1 conv (4 -> C) as 4 broadcast FMAs; gate applied as x * (1 + g)
    wm = p["merge"]["w"][0]                                  # (4, C)
    g = p["merge"]["b"][:, None] + wm[0][:, None] * y[:, 0:1, :]
    for f in range(1, wm.shape[0]):
        g = g + wm[f][:, None] * y[:, f:f + 1, :]
    return x * (1.0 + g)
