"""Transposed-layout ``(B, C, T)`` ops for narrow-channel sections.

Why this layout exists: XLA maps the minor axis onto the TPU's 128-wide lanes.
The codec's outer conv stages run at (near-)audio rate with only 24-48
channels (reference ``l3ac/modules.py:71-201`` geometry), so channels-last
activations pad 24 -> 128 lanes — >5x wasted HBM traffic and VPU width on the
longest sequences in the model. Putting *time* in lanes and channels in
sublanes packs every vector full. These are the pure-jnp forms; the Pallas
kernels in ``ops/pallas`` consume/produce the same layout so whole narrow
sections run without a single relayout.

Every op here is the exact math of its channels-last sibling in
``l3ac_tpu.ops`` (same reduction axes relative to semantics, same eps), just
on transposed operands.
"""

import jax.numpy as jnp
from jax import lax

from ..parallel import sp
from .norms import EPS


def to_t(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C) -> (B, C, T)."""
    return x.transpose(0, 2, 1)


def from_t(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T) -> (B, T, C)."""
    return x.transpose(0, 2, 1)


def conv1d_t(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None, *,
             stride: int = 1, padding: int = 0, dilation: int = 1,
             groups: int = 1) -> jnp.ndarray:
    """General 1-D conv on (B, C, T). w: (K, Cin//groups, Cout) — same weight
    layout as :func:`l3ac_tpu.ops.conv1d`. SP-aware like its sibling."""
    if padding and sp.active():
        assert stride == 1
        assert (w.shape[0] - 1) * dilation == 2 * padding
        x = sp.pad_time(x, padding, padding, axis=2)
        padding = 0
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCW", "WIO", "NCW"))
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b[:, None]
    return y


def conv1x1_t(x: jnp.ndarray, w: jnp.ndarray,
              b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pointwise conv on (B, C, T): per batch a (Cout, Cin) @ (Cin, T) matmul.
    w: (1, Cin, Cout) or (Cin, Cout)."""
    wm = w[0] if w.ndim == 3 else w
    y = jnp.einsum("co,bct->bot", wm, x, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b[:, None]
    return y


def channel_norm_t(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                   eps: float = EPS) -> jnp.ndarray:
    """Normalize over the channel (sublane) axis of (B, C, T)."""
    from .norms import _stat_dtype
    xs = x.astype(_stat_dtype(x))
    u = jnp.mean(xs, axis=1, keepdims=True)
    s = jnp.mean((xs - u) ** 2, axis=1, keepdims=True)
    xn = ((xs - u) / jnp.sqrt(s + eps)).astype(x.dtype)
    return weight[:, None] * xn + bias[:, None]


def instance_norm_t(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                    eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over the time (lane) axis of (B, C, T). Under SP the
    moments reduce over the *global* time axis via psum."""
    from .norms import _stat_dtype
    xs = x.astype(_stat_dtype(x))
    if sp.active():
        n = x.shape[2] * sp.size()
        s1 = sp.psum_if_active(jnp.sum(xs, axis=2, keepdims=True))
        s2 = sp.psum_if_active(jnp.sum(xs * xs, axis=2, keepdims=True))
        u = s1 / n
        # clamp one-pass variance against catastrophic cancellation (see
        # norms.instance_norm)
        s = jnp.maximum(s2 / n - u * u, 0.0)
    else:
        u = jnp.mean(xs, axis=2, keepdims=True)
        s = jnp.mean((xs - u) ** 2, axis=2, keepdims=True)
    xn = ((xs - u) / jnp.sqrt(s + eps)).astype(x.dtype)
    return weight[:, None] * xn + bias[:, None]


def conv1d_strided_matmul_t(x: jnp.ndarray, w: jnp.ndarray,
                            b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Conv with kernel_size == stride on transposed (B, C, T) activations,
    staying transposed: (B, Ci, T) -> (B, Co, T // K).

    Same contraction as :func:`l3ac_tpu.ops.conv.conv1d_strided_matmul`
    (``w``: (K, Ci, Co), no padding, ``T % K == 0``) without the layout
    round-trip — the encoder's narrow stages feed their downsample directly
    from the lane-packed layout (reference conv: ``l3ac/modules.py:97-100``).
    """
    B, C, T = x.shape
    K, Cin, Cout = w.shape
    assert Cin == C, (Cin, C)
    assert T % K == 0, (T, K)
    xr = x.reshape(B, C, T // K, K)
    y = jnp.einsum("bctk,kco->bot", xr, w,
                   preferred_element_type=x.dtype)
    if b is not None:
        y = y + b[:, None]
    return y


def grn_t(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
          eps: float = EPS) -> jnp.ndarray:
    """Reference GRN quirk on (B, C, T) — the norm is a per-batch scalar either
    way (see :func:`l3ac_tpu.ops.grn`)."""
    from .norms import _stat_dtype
    xs = x.astype(_stat_dtype(x))
    g = jnp.sqrt(sp.psum_if_active(jnp.sum(xs * xs, axis=(1, 2), keepdims=True)))
    n = (g / (g + eps)).astype(x.dtype)
    return gamma[:, None] * (x * n) + beta[:, None] + x


def snake_t(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation on (B, C, T) (or (C, T)); alpha: (C,)."""
    a = alpha[:, None]
    return x + jnp.sin(a * x) ** 2 / (a + 1e-8)


def upsample_linear_t(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Linear-interp upsample on (B, C, T) -> (B, C, T*scale); same phase
    decomposition as :func:`l3ac_tpu.ops.upsample_linear`."""
    if scale == 1:
        return x
    B, C, T = x.shape
    x_prev = sp.shift_right(x, axis=2)
    x_next = sp.shift_left(x, axis=2)
    phases = []
    for p in range(scale):
        d = (p + 0.5) / scale - 0.5
        if d >= 0:
            phases.append(x * (1.0 - d) + x_next * d)
        else:
            w = 1.0 + d
            phases.append(x_prev * (1.0 - w) + x * w)
    return jnp.stack(phases, axis=3).reshape(B, C, T * scale)


def trend_pool_t(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Trend pool on (B, C, T): avg_pool(max_pool(|x|)), stride 1, torch padding
    semantics (max pads -inf, avg pads zero and divides by k regardless)."""
    from .pool import trend_pool
    return trend_pool(x, kernel_size, axis=2)
