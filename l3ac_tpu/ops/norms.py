"""Normalization ops, channels-last ``(B, T, C)``.

Semantics match the reference:
- channel_norm / layer_norm: normalize over the channel axis with eps *inside* the
  sqrt, eps=1e-8 (reference ``l3ac/layers.py:50-86``, ``l3ac/xtract/nn/utils.py:33``).
  In the reference the channels_first and channels_last code paths are numerically
  identical (both normalize channels); here everything is channels-last so one op
  serves both.
- grn: Global Response Norm with the reference's (nonstandard) per-batch scalar
  norm: ``g = ||x||_2 over (T, C)`` — NOT per-channel as in ConvNeXt-V2. Replicated
  exactly (reference ``l3ac/layers.py:89-118``); do not "fix".
- instance_norm: per-(batch, channel) normalization over time, eps=1e-5, matching
  ``torch.nn.InstanceNorm1d(affine=True)`` defaults used by EnhanceBlock
  (reference ``l3ac/tconv/__init__.py:34-38``).
"""

import jax.numpy as jnp

from ..parallel import sp

EPS = 1e-8


def _stat_dtype(x: jnp.ndarray):
    """Moments are computed in fp32 when the ambient dtype is narrower: the
    eps values here (1e-8, 1e-5) are at or below bf16 resolution, and mean/var
    cancellation in bf16 loses most of the signal. Weights/activations stay in
    the ambient dtype — only the reduction runs wide (free on TPU: the VPU
    accumulates fp32 anyway)."""
    return jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype


def channel_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                 eps: float = EPS) -> jnp.ndarray:
    """Normalize over the last (channel) axis. ``weight``/``bias``: (C,)."""
    xs = x.astype(_stat_dtype(x))
    u = jnp.mean(xs, axis=-1, keepdims=True)
    s = jnp.mean((xs - u) ** 2, axis=-1, keepdims=True)
    xn = ((xs - u) / jnp.sqrt(s + eps)).astype(x.dtype)
    return weight * xn + bias


# torch.nn.LayerNorm default eps (used by the local-transformer pre-norms)
layer_norm_eps = 1e-5


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = layer_norm_eps) -> jnp.ndarray:
    """LayerNorm over last axis with torch's default eps=1e-5."""
    return channel_norm(x, weight, bias, eps=eps)


def grn(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
        eps: float = EPS) -> jnp.ndarray:
    """Reference GRN quirk (``l3ac/layers.py:112-115``).

    ``g = ||x||_2`` over (T, C) per batch element → shape (B, 1, 1); the reference
    then takes ``n = g / (mean_over_channels(g) + eps)`` but since ``g`` is already a
    per-batch scalar the channel mean is the identity, so ``n = g / (g + eps) ≈ 1``.
    ``y = gamma * (x * n) + beta + x``. gamma/beta: (C,).
    """
    xs = x.astype(_stat_dtype(x))
    g = jnp.sqrt(sp.psum_if_active(jnp.sum(xs * xs, axis=(1, 2), keepdims=True)))
    n = (g / (g + eps)).astype(x.dtype)
    return gamma * (x * n) + beta + x


def instance_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                  eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over the time axis of (B, T, C). ``weight``/``bias``: (C,).
    Under SP the moments reduce over the *global* time axis via psum."""
    xs = x.astype(_stat_dtype(x))
    if sp.active():
        n = x.shape[1] * sp.size()
        s1 = sp.psum_if_active(jnp.sum(xs, axis=1, keepdims=True))
        s2 = sp.psum_if_active(jnp.sum(xs * xs, axis=1, keepdims=True))
        u = s1 / n
        # one-pass variance can go slightly negative from cancellation for
        # large-mean/low-variance inputs; clamp so sqrt(s + eps) never NaNs
        s = jnp.maximum(s2 / n - u * u, 0.0)
    else:
        u = jnp.mean(xs, axis=1, keepdims=True)
        s = jnp.mean((xs - u) ** 2, axis=1, keepdims=True)
    xn = ((xs - u) / jnp.sqrt(s + eps)).astype(x.dtype)
    return weight * xn + bias
