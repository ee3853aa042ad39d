"""INT8 weight-only quantization (north-star capability, BASELINE.json).

Per-output-channel symmetric int8 for matmul/conv weights; activations stay
bf16/fp32. For this model family weights are small (~10M params) so the win is
HBM residency and weight-streaming bandwidth at small batch; the capability is
wired as a params transform plus matmul helpers. On TPU, quantized matmuls run
through the fused dequant-matmul Pallas kernel (``ops/pallas/int8_matmul.py``
— int8 dequantized in VMEM right before the MXU dot, HBM streams 1
byte/param); elsewhere the jnp fallback dequantizes inline. Appliers consume
quantized leaves transparently (``ops.conv.linear_p``, models/layers.py
``_dense_w``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, axis: int = -1):
    """Symmetric per-out-channel int8. Returns (w_q int8, scale f32).

    ``axis`` is the output-channel axis (kept un-reduced in the scale).
    """
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                   keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                   ).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def dequantize_weight(w_q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    return (w_q.astype(jnp.float32) * scale).astype(dtype)


def int8_linear(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                b: jnp.ndarray | None = None) -> jnp.ndarray:
    """x (..., Cin) @ int8 w (Cin, Cout) with per-Cout scale (1, Cout).

    On TPU routes to the fused Pallas dequant-matmul
    (``ops/pallas/int8_matmul.py``) — the int8 tile is dequantized in VMEM
    right before the MXU dot, so HBM streams 1 byte/param. The jnp fallback
    materializes a dequantized weight (XLA does not fuse producers into dot
    operands).
    """
    from . import pallas as pk
    if pk.enabled():
        return pk.int8_matmul.int8_matmul(x, w_q, scale, b,
                                          interpret=pk.interpret_default())
    w = w_q.astype(x.dtype) * scale.astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


_QUANT_SUFFIXES = ("pw1", "pw2", "qkv", "out", "w1", "w2", "proj_in",
                   "proj_out")


def quantize_params(params, *, min_size: int = 1024):
    """Transform a codec param pytree: each large 2-D matmul weight ``w`` is
    replaced by ``{"w_q": int8, "w_scale": f32}``. Appliers transparently
    accept either form via :func:`maybe_dequant`."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (isinstance(v, dict) and "w" in v
                        and not isinstance(v["w"], dict)
                        and v["w"].ndim == 2 and v["w"].size >= min_size
                        and k in _QUANT_SUFFIXES):
                    w_q, scale = quantize_weight(v["w"], axis=-1)
                    q = {"w_q": w_q, "w_scale": scale}
                    if "b" in v:
                        q["b"] = v["b"]
                    out[k] = q
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def maybe_dequant(p: dict, dtype=jnp.bfloat16) -> dict:
    """Return a {"w": dense, "b": ...} view of a possibly-quantized leaf dict."""
    if "w_q" in p:
        out = {"w": dequantize_weight(p["w_q"], p["w_scale"], dtype)}
        if "b" in p:
            out["b"] = p["b"]
        return out
    return p
