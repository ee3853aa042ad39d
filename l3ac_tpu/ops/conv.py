"""1-D convolutions, channels-last ``(B, T, C)``.

Weight layout: ``(K, C_in // groups, C_out)`` — transposed from torch's
``(C_out, C_in // groups, K)``. Weight-norm parametrization is folded at
load/convert time (see :func:`fold_weight_norm`), so runtime convs see plain
dense weights; reference parametrization at ``l3ac/layers.py:11-25``.

Strided convs with ``kernel_size == stride`` (the encoder's downsampling convs,
reference ``l3ac/modules.py:97-99``) have non-overlapping windows, so they are
lowered to a reshape + matmul that maps directly onto the MXU
(:func:`conv1d_strided_matmul`).
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import sp


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None, *,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """General 1-D conv. x: (B, T, Cin); w: (K, Cin//groups, Cout); b: (Cout,).

    Under sequence parallelism (``parallel.sp``) the symmetric zero padding
    becomes a neighbor halo exchange (zero fill at the global edges — identical
    to the monolithic zero pad) followed by a VALID conv.
    """
    if padding and sp.active():
        assert stride == 1, "sp conv1d supports stride 1 (strided convs are pad-free)"
        assert (w.shape[0] - 1) * dilation == 2 * padding, "sp conv1d needs centered SAME padding"
        x = sp.pad_time(x, padding, padding, axis=1)
        padding = 0
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NWC", "WIO", "NWC"))
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def conv1d_strided_matmul(x: jnp.ndarray, w: jnp.ndarray,
                          b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Conv with kernel_size == stride as reshape + matmul (MXU-friendly).

    Equivalent to ``conv1d(x, w, b, stride=K)`` with no padding. Requires
    ``T % K == 0`` (guaranteed by the codec's right-pad-to-hop preprocessing).
    """
    B, T, C = x.shape
    K, Cin, Cout = w.shape
    assert Cin == C, (Cin, C)
    assert T % K == 0, (T, K)
    xw = x.reshape(B, T // K, K * C)
    wm = w.reshape(K * C, Cout)
    y = jnp.dot(xw, wm, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def fold_weight_norm(g: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fold torch weight_norm parametrization: ``W = g * v / ||v||``.

    torch's weight_norm uses dim=0 (per-output-channel norm over all remaining
    dims). Inputs here are in *torch* layout: ``v``: (C_out, ...), ``g``:
    (C_out, 1, ...) or (C_out,). Returns W in torch layout; transpose to the
    channels-last kernel layout afterwards.
    """
    axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return g.reshape(v.shape[0], *([1] * (v.ndim - 1))) * v / norm


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dense layer. x: (..., Cin); w: (Cin, Cout)."""
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def linear_p(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Dense layer from a param dict; transparently supports int8 weight-only
    quantized leaves ({"w_q", "w_scale"}) produced by ops.quantized. On TPU the
    quantized form routes to the fused dequant-matmul Pallas kernel (weights
    at 1 byte/param in HBM; the jnp fallback materializes a dequantized copy).
    Note int8 here trades ~speed (measured 0.1-0.9x dense bf16 at this model's
    weight sizes, BENCH_NOTES.md) for 2x weight memory."""
    if "w_q" in p:
        from . import pallas as pk
        if pk.enabled():
            return pk.int8_matmul.int8_matmul(x, p["w_q"], p["w_scale"],
                                              p.get("b"),
                                              interpret=pk.interpret_default())
        w = (p["w_q"].astype(x.dtype) * p["w_scale"].astype(x.dtype))
    else:
        w = p["w"]
    return linear(x, w, p.get("b"))
