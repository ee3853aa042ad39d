"""Parameter initializers mirroring the reference's init scheme.

Weight-normed Conv1d/Linear in the reference (``l3ac/layers.py:11-25``) are
initialized with trunc_normal(std=.02) and zero bias; at init weight_norm is the
identity (g = ||v||), so folded init == trunc_normal. torch's trunc_normal_
truncates at absolute +-2 which, at std=.02, is +-100 sigma — plain normal is
numerically identical.

Plain torch layers (VQEmbed projections ``l3ac/vq/__init__.py:11-15``,
EnhanceBlock merge conv ``l3ac/tconv/__init__.py:34-38``, transformer linears)
use torch's default kaiming-uniform: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias.
"""

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_params(key, k: int, cin: int, cout: int, *, groups: int = 1,
                dtype=jnp.float32) -> dict:
    """Weight-norm-style conv init. w: (K, Cin//groups, Cout), b: (Cout,)."""
    return {
        "w": trunc_normal(key, (k, cin // groups, cout), dtype=dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def linear_params(key, cin: int, cout: int, *, dtype=jnp.float32) -> dict:
    """Weight-norm-style linear init. w: (Cin, Cout), b: (Cout,)."""
    return {
        "w": trunc_normal(key, (cin, cout), dtype=dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def torch_linear_params(key, cin: int, cout: int, *, bias: bool = True,
                        dtype=jnp.float32) -> dict:
    """torch nn.Linear default init. w: (Cin, Cout)."""
    kw, kb = jax.random.split(key)
    bound = cin ** -0.5
    p = {"w": _uniform(kw, (cin, cout), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (cout,), bound, dtype)
    return p


def torch_conv_params(key, k: int, cin: int, cout: int, *, groups: int = 1,
                      dtype=jnp.float32) -> dict:
    """torch nn.Conv1d default init. w: (K, Cin//groups, Cout)."""
    kw, kb = jax.random.split(key)
    fan_in = (cin // groups) * k
    bound = fan_in ** -0.5
    return {
        "w": _uniform(kw, (k, cin // groups, cout), bound, dtype),
        "b": _uniform(kb, (cout,), bound, dtype),
    }


def norm_params(dim: int, dtype=jnp.float32) -> dict:
    return {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def grn_params(dim: int, dtype=jnp.float32) -> dict:
    return {"gamma": jnp.zeros((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}
