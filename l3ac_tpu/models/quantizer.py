"""VQ embed wrapper: projections around the FSQ quantizer.

Mirrors VQEmbed (``l3ac/vq/__init__.py:6-30``): plain (non-weight-normed)
Linear project_in feature_dim -> codebook_dim and project_out back (identity
when equal). For released models: Linear 128->6 and 6->128 (1,670 params).
"""

import jax
import jax.numpy as jnp

from ..config import VQConfig
from ..ops import fsq
from ..ops.conv import linear_p
from ..utils import init as pinit


def init_quantizer(key, feature_dim: int, vq: VQConfig, dtype=jnp.float32) -> dict:
    if feature_dim == vq.codebook_dim:
        return {}
    k0, k1 = jax.random.split(key)
    return {
        "proj_in": pinit.torch_linear_params(k0, feature_dim, vq.codebook_dim,
                                             dtype=dtype),
        "proj_out": pinit.torch_linear_params(k1, vq.codebook_dim, feature_dim,
                                              dtype=dtype),
    }


def quantizer_apply(p: dict, x: jnp.ndarray, vq: VQConfig, *,
                    training: bool = False, rng=None):
    """x: (B, T, feature_dim) -> (q_features, indices (B,T) int32, level_indices).

    Eval path (noise_rate forced 0, reference ``l3ac/vq/fsq.py:31``); the
    training path applies the straight-through estimator and, when ``rng`` is
    given, the reference's uniform-noise injection at ``vq.noise_rate``.
    """
    z = linear_p(x, p["proj_in"]) if p else x
    if training:
        q_z, indices, li = fsq.quantize_ste(z, vq.levels,
                                            noise_rate=vq.noise_rate, rng=rng)
    else:
        q_z, indices, li = fsq.quantize(z, vq.levels)
    q = linear_p(q_z, p["proj_out"]) if p else q_z
    return q, indices, li


def indices_to_features(p: dict, indices: jnp.ndarray, vq: VQConfig,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Closed-form decode path (``VQEmbed.to_features``, ``l3ac/vq/__init__.py:20-23``)."""
    codes = fsq.indices_to_codes(indices, vq.levels, dtype=dtype)
    return linear_p(codes, p["proj_out"]) if p else codes
