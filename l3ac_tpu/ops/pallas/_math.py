"""Math helpers for Pallas TPU kernels.

Mosaic has no erf/erfc primitive; exact GELU inside kernels uses an
Abramowitz–Stegun 7.1.26 rational approximation of erf (max abs error
~1.5e-7 — below bf16 resolution and the fp32 parity tolerances).
"""

import jax.numpy as jnp

_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_P = 0.3275911
_INV_SQRT2 = 0.7071067811865476


def erf_approx(x: jnp.ndarray) -> jnp.ndarray:
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    poly = t * (_A[0] + t * (_A[1] + t * (_A[2] + t * (_A[3] + t * _A[4]))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU matching torch.nn.GELU() within ~1e-7."""
    return 0.5 * x * (1.0 + erf_approx(x * _INV_SQRT2))
