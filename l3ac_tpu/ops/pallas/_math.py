"""Math helpers for Pallas TPU kernels.

Mosaic has no erf/erfc primitive; exact GELU inside kernels uses an
Abramowitz–Stegun 7.1.26 rational approximation of erf (max abs error
~1.5e-7 — below bf16 resolution and the fp32 parity tolerances).

Fast sine (opt-in): Mosaic's fp32 ``sin`` lowering costs ~1.4 ms per 71M
elements on v5e where tanh/exp are free (BENCH_NOTES.md round 3); a
Cody-Waite-reduced degree-13 odd polynomial (max abs error ~6.4e-7 for
|x| <= 1000 — a few fp32 ulps, far below bf16 resolution) runs ~5x faster.
Because the snake feeds the FSQ quantizer on the encode side, a ~1e-6
perturbation can in principle flip a borderline index, so the exact
``jnp.sin`` stays the DEFAULT; set ``L3AC_TPU_FAST_SINE=1`` (before first
trace — the jit caches do not key on it) to opt in. All bit-exactness tests
run with it off.
"""

import os

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


# degree-13 odd least-squares fit of sin on [-pi, pi] (Chebyshev nodes);
# Cody-Waite two-constant 2*pi reduction keeps fp32 accuracy to |x| ~ 1e3
_SIN_C = (9.9999999447e-01, -1.6666664570e-01, 8.3333102939e-03,
          -1.9840151885e-04, 2.7529395421e-06, -2.4676492620e-08,
          1.3449989413e-10)
_TWO_PI_HI = 6.28125
_TWO_PI_LO = 0.0019353071693331003
_INV_TWO_PI = 0.15915494309189535


def sin_poly(x: jnp.ndarray) -> jnp.ndarray:
    """fp32 sine via range reduction + odd polynomial (max abs err ~6.4e-7)."""
    k = jnp.round(x * _INV_TWO_PI)
    r = (x - k * _TWO_PI_HI) - k * _TWO_PI_LO
    r2 = r * r
    acc = jnp.full_like(r, _SIN_C[-1])
    for c in _SIN_C[-2::-1]:
        acc = acc * r2 + c
    return acc * r


def fast_sine_enabled() -> bool:
    """Resolved at TRACE time — set L3AC_TPU_FAST_SINE before first use."""
    return bool(os.environ.get("L3AC_TPU_FAST_SINE"))


def sin(x: jnp.ndarray) -> jnp.ndarray:
    if fast_sine_enabled():
        return sin_poly(x)
    return jnp.sin(x)


def snake(h: jnp.ndarray, alpha) -> jnp.ndarray:
    """Snake activation, fp32 (Mosaic cannot legalize bf16 sin; the parity
    contract computes sin in fp32 regardless of activation dtype). ``h`` is
    cast to fp32; caller casts the result back if it wants a narrower chain.

    In fast-sine (production) mode the 1/(alpha+eps) reciprocal is computed
    on the SMALL per-channel alpha array and broadcast-multiplied: a
    full-size VPU divide on the (4C, S) intermediate costs ~5x a multiply
    and alpha is constant per channel. Exact mode keeps the literal
    ``s*s/(a+eps)`` so the kernel stays bit-exact to the jnp/torch formula
    (the FSQ-index bit-exactness contract — same reasoning as exact sine)."""
    hf = h.astype(jnp.float32)
    a = jnp.asarray(alpha).astype(jnp.float32)
    s = sin(a * hf)
    if fast_sine_enabled():
        return hf + s * s * (1.0 / (a + 1e-8))
    return hf + s * s / (a + 1e-8)
