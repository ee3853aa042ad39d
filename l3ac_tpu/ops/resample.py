"""Linear-interpolation upsampling matching ``nn.Upsample(mode='linear',
align_corners=False)`` (reference ``l3ac/modules.py:160-163``, ``l3ac/local_trans.py:123``).

For an integer scale factor r, output j maps to source coordinate
``c = (j + 0.5)/r - 0.5`` clamped to ``[0, T-1]`` with edge replication — exactly
torch's area_pixel_compute_source_index semantics. Because r is static, the r
interpolation phases have *constant* weights, so the op decomposes into r
weighted sums of x and its +-1 shifts followed by an interleave — pure VPU work,
no gather, fuses with neighbors under XLA.
"""

import jax.numpy as jnp

from ..parallel import sp


def upsample_linear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T*scale, C). SP-aware: the +-1 shifts fetch the
    neighbor shard's boundary frame; clamping only happens at the global edges
    (matching torch's align_corners=False semantics exactly)."""
    if scale == 1:
        return x
    B, T, C = x.shape
    x_prev = sp.shift_right(x, axis=1)   # x[n-1], edge-clamped globally
    x_next = sp.shift_left(x, axis=1)    # x[n+1], edge-clamped globally
    phases = []
    for p in range(scale):
        d = (p + 0.5) / scale - 0.5
        if d >= 0:
            # c = n + d; i0 = n, i1 = n+1 (clamped at the right edge by x_next)
            phases.append(x * (1.0 - d) + x_next * d)
        else:
            # c = n + d with d < 0; i0 = n-1, weight on x[n] is 1+d.
            # At n=0, c < 0 clamps to 0: x_prev[0] = x[0] makes the blend exact.
            w = 1.0 + d
            phases.append(x_prev * (1.0 - w) + x * w)
    return jnp.stack(phases, axis=2).reshape(B, T * scale, C)
