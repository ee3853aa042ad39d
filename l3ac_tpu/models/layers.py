"""Primitive conv blocks: ConvUnit (ConvNeXt-ish) and LegacyUnit (DAC-style).

Functional modules: ``init_*`` builds a param pytree, ``*_apply`` runs it on
channels-last activations (B, T, C). Semantics match the reference
(``l3ac/modules.py:10-64``): residual adds are part of the *_unit appliers
(reference wraps in ``Residual``); train-only stochastic-depth drop-path is
supported via ``drop_rate``/``rng`` kwargs (``ops/droppath.py``) and inert at
inference — the released configs all train with rate 0.
"""

import jax
import jax.numpy as jnp

from ..ops import conv1d, snake, gelu, channel_norm, grn
from ..ops.conv import linear_p
from ..utils import init as pinit


def init_conv_unit(key, dim: int, *, snake_act: bool = True, use_norm: bool = False,
                   dilation: int = 1, kernel_size: int = 7, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "dw": pinit.conv_params(k1, kernel_size, dim, dim, groups=dim, dtype=dtype),
        "pw1": pinit.linear_params(k2, dim, 4 * dim, dtype=dtype),
        "grn": pinit.grn_params(4 * dim, dtype),
        "pw2": pinit.linear_params(k3, 4 * dim, dim, dtype=dtype),
    }
    if use_norm:
        p["norm"] = pinit.norm_params(dim, dtype)
    if snake_act:
        p["alpha"] = jnp.ones((4 * dim,), dtype)
    return p


def conv_unit_apply(p: dict, x: jnp.ndarray, *, dilation: int = 1,
                    kernel_size: int = 7) -> jnp.ndarray:
    """ConvUnit body (no residual): dwConv7 -> [ChannelNorm] -> Linear x4 ->
    Snake/GELU -> GRN -> Linear (reference ``l3ac/modules.py:32-41``)."""
    dim = x.shape[-1]
    pad = (kernel_size - 1) * dilation // 2
    y = conv1d(x, p["dw"]["w"], p["dw"]["b"], padding=pad, dilation=dilation,
               groups=dim)
    if "norm" in p:
        y = channel_norm(y, p["norm"]["w"], p["norm"]["b"])
    y = linear_p(y, p["pw1"])
    y = snake(y, p["alpha"]) if "alpha" in p else gelu(y)
    y = grn(y, p["grn"]["gamma"], p["grn"]["beta"])
    y = linear_p(y, p["pw2"])
    return y


def _sp_halos(x, *, axis: int, dilation: int = 1, kernel_size: int = 7):
    """(lh, rh) neighbor halo blocks for a SAME-padded conv under SP, or
    (None, None) monolithically — zeros at the global edges match the conv's
    zero padding exactly."""
    from ..parallel import sp
    if not sp.active():
        return None, None
    halo = (kernel_size - 1) * dilation // 2
    return sp.halo_blocks(x, halo, halo, axis=axis)


def _maybe_drop(x, out, drop_rate, rng):
    """Apply train-only stochastic depth to a residual output ``out = x +
    branch``: the branch is recovered as ``out - x`` so drop-path composes
    with the FUSED kernel paths too (no train-time perf cliff from falling
    back to the jnp branch)."""
    if drop_rate > 0.0 and rng is not None:
        from ..ops.droppath import drop_path
        return x + drop_path(rng, out - x, drop_rate)
    return out


def residual_conv_unit_apply(p: dict, x: jnp.ndarray, *, drop_rate: float = 0.0,
                             rng=None, **kw) -> jnp.ndarray:
    from ..ops import pallas as pk
    if pk.enabled() and "w" in p["pw1"]:  # dense weights only
        lh, rh = _sp_halos(x, axis=1, **kw)
        itp = pk.interpret_default()
        # natural layout for wide channels; transposed (time-in-lanes) layout
        # for narrow ones (measured crossover on v5e)
        if x.shape[-1] >= 96:
            out = pk.conv_unit.conv_unit(x, p, lh=lh, rh=rh, interpret=itp,
                                         **kw)
        else:
            out = pk.conv_unit.conv_unit_t(x, p, lh=lh, rh=rh, interpret=itp,
                                           **kw)
        return _maybe_drop(x, out, drop_rate, rng)
    return _maybe_drop(x, x + conv_unit_apply(p, x, **kw), drop_rate, rng)


def _dense_w(p: dict, dtype) -> jnp.ndarray:
    """Dense weight from a param dict, transparently dequantizing int8
    weight-only leaves ({"w_q", "w_scale"}) produced by ops.quantized."""
    if "w_q" in p:
        return p["w_q"].astype(dtype) * p["w_scale"].astype(dtype)
    return p["w"]


def conv_unit_apply_t(p: dict, x: jnp.ndarray, *, dilation: int = 1,
                      kernel_size: int = 7) -> jnp.ndarray:
    """ConvUnit body on transposed (B, C, T) activations — exact math of
    :func:`conv_unit_apply` for the narrow-channel (lane-packed) layout."""
    from ..ops import transposed as tx
    dim = x.shape[1]
    pad = (kernel_size - 1) * dilation // 2
    y = tx.conv1d_t(x, p["dw"]["w"], p["dw"]["b"], padding=pad,
                    dilation=dilation, groups=dim)
    if "norm" in p:
        y = tx.channel_norm_t(y, p["norm"]["w"], p["norm"]["b"])
    w1 = _dense_w(p["pw1"], x.dtype)
    y = tx.conv1x1_t(y, w1.reshape(1, *w1.shape), p["pw1"]["b"])
    y = tx.snake_t(y, p["alpha"]) if "alpha" in p else gelu(y)
    y = tx.grn_t(y, p["grn"]["gamma"], p["grn"]["beta"])
    w2 = _dense_w(p["pw2"], x.dtype)
    y = tx.conv1x1_t(y, w2.reshape(1, *w2.shape), p["pw2"]["b"])
    return y


def residual_conv_unit_apply_t(p: dict, x: jnp.ndarray, *,
                               drop_rate: float = 0.0, rng=None,
                               **kw) -> jnp.ndarray:
    from ..ops import pallas as pk
    if pk.enabled() and "w" in p["pw1"]:
        lh, rh = _sp_halos(x, axis=2, **kw)
        out = pk.conv_unit.conv_unit_ct(x, p, lh=lh, rh=rh,
                                        interpret=pk.interpret_default(),
                                        **kw)
        return _maybe_drop(x, out, drop_rate, rng)
    return _maybe_drop(x, x + conv_unit_apply_t(p, x, **kw), drop_rate, rng)


def init_legacy_unit(key, dim: int, *, dilation: int = 1, kernel_size: int = 7,
                     dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "alpha1": jnp.ones((dim,), dtype),
        "conv1": pinit.conv_params(k1, kernel_size, dim, dim, dtype=dtype),
        "alpha2": jnp.ones((dim,), dtype),
        "conv2": pinit.conv_params(k2, 1, dim, dim, dtype=dtype),
    }


def legacy_unit_apply(p: dict, x: jnp.ndarray, *, dilation: int = 1,
                      kernel_size: int = 7) -> jnp.ndarray:
    """LegacyUnit: Snake -> Conv(k7, dil) -> Snake -> Conv(k1), residual outside
    (reference ``l3ac/modules.py:47-64``)."""
    pad = (kernel_size - 1) * dilation // 2
    y = snake(x, p["alpha1"])
    y = conv1d(y, p["conv1"]["w"], p["conv1"]["b"], padding=pad, dilation=dilation)
    y = snake(y, p["alpha2"])
    y = conv1d(y, p["conv2"]["w"], p["conv2"]["b"])
    return y


def residual_legacy_unit_apply(p: dict, x: jnp.ndarray, **kw) -> jnp.ndarray:
    return x + legacy_unit_apply(p, x, **kw)


def legacy_unit_apply_t(p: dict, x: jnp.ndarray, *, dilation: int = 1,
                        kernel_size: int = 7) -> jnp.ndarray:
    """LegacyUnit on transposed (B, C, T) activations."""
    from ..ops import transposed as tx
    pad = (kernel_size - 1) * dilation // 2
    y = tx.snake_t(x, p["alpha1"])
    y = tx.conv1d_t(y, p["conv1"]["w"], p["conv1"]["b"], padding=pad,
                    dilation=dilation)
    y = tx.snake_t(y, p["alpha2"])
    y = tx.conv1x1_t(y, p["conv2"]["w"], p["conv2"]["b"])
    return y
