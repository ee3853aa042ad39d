"""Finite Scalar Quantization — exact reference math (``l3ac/vq/fsq.py``).

There is no codebook tensor and no nearest-neighbor search: encode is a
per-dimension squash + round, and the integer index is a mixed-radix pack.
Everything here is elementwise over (..., D) with D = len(levels) (6 for the
released models) — trivially shardable over batch/time.

Numerics: the squash and rounding are computed in float32 regardless of the
ambient compute dtype so that integer indices are bit-exact across
fp32/bf16 inference modes (tanh saturation near +-1 is the danger zone).

The released configs use act='tanh' with the linear inverse ``x*2 - 1``
(``l3ac/vq/fsq.py:19-23``: inv_act is overridden; the arctanh path is unused).
The cdf/sigmoid activations are provided for config parity.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def act_fn(name: str):
    """(-inf, inf) -> [0, 1] squashing activation (reference ``l3ac/vq/fsq_act.py``)."""
    if name == "tanh":
        return lambda z: (jnp.tanh(z) + 1.0) / 2.0
    if name == "cdf":
        return lambda z: (1.0 + jax.scipy.special.erf(z / SQRT2)) / 2.0
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise NotImplementedError(f"act_func({name}) has not been implemented yet.")


def inv_act_fn(name: str):
    """(0, 1) -> (-inf, inf) exact inverses (reference ``fsq_act.py``). The
    released configs never use these (decode uses the linear ``x*2-1``
    override, ``l3ac/vq/fsq.py:20``); provided for config parity."""
    if name == "tanh":
        return lambda a: jnp.arctanh(a * 2.0 - 1.0)
    if name == "cdf":
        return lambda a: jax.scipy.special.erfinv(2.0 * a - 1.0) * SQRT2
    if name == "sigmoid":
        return lambda a: jnp.log(a / (1.0 - a))
    raise NotImplementedError(f"act_func({name}) has not been implemented yet.")


def _levels_arrays(levels: tuple[int, ...]):
    lv = jnp.asarray(levels, dtype=jnp.float32)
    basis = jnp.asarray(
        [math.prod(levels[:i]) for i in range(len(levels))], dtype=jnp.int32)
    return lv, basis


def quantize(z: jnp.ndarray, levels: tuple[int, ...], *, act: str = "tanh",
             special_edge: bool = True):
    """Quantize latents.

    z: (..., D) -> (q_z (..., D) float, indices (...) int32, level_indices (..., D) int32)

    Matches ``SuperFSQ.forward`` in eval mode (noise_rate=0): per-dim squash to
    [0, 1], round to one of L levels ("special_edge" hits 0 and L-1 exactly),
    then the linear inverse maps back to [-1, 1].
    """
    lv, basis = _levels_arrays(levels)
    act_z = act_fn(act)(z.astype(jnp.float32))
    if special_edge:
        # round-half-to-even, identical to torch.round / np.round
        li = jnp.round(act_z * (lv - 1.0))
        q_act = li / (lv - 1.0)
    else:
        li = jnp.floor(act_z * lv * 0.999)
        q_act = (li + 0.5) / lv
    indices = jnp.sum(li.astype(jnp.int32) * basis, axis=-1, dtype=jnp.int32)
    q_z = q_act * 2.0 - 1.0
    return q_z.astype(z.dtype), indices, li.astype(jnp.int32)


def quantize_ste(z: jnp.ndarray, levels: tuple[int, ...], *, act: str = "tanh",
                 special_edge: bool = True, noise_rate: float = 0.0,
                 rng: jax.Array | None = None):
    """Training-path quantize with the reference's straight-through estimator.

    The reference (``l3ac/vq/fsq.py:56-65``) applies STE at the *act value*:
    gradients flow through ``act_z`` (i.e. through the squash), while the
    round and the linear inverse are treated as pass-through. With
    ``noise_rate > 0`` and an ``rng`` key, each element is, with that
    probability, replaced by ``act_z + U(-.5,.5)/levels`` instead of its
    quantized value (``l3ac/vq/fsq.py:40-43``).
    """
    lv, _ = _levels_arrays(levels)
    act_f = act_fn(act)

    def _q_act(a):
        if special_edge:
            return jnp.round(a * (lv - 1.0)) / (lv - 1.0)
        return (jnp.floor(a * lv * 0.999) + 0.5) / lv

    act_z = act_f(z.astype(jnp.float32))
    q_act = act_z + jax.lax.stop_gradient(_q_act(act_z) - act_z)
    if noise_rate > 0.0 and rng is not None:
        k1, k2 = jax.random.split(rng)
        mask = jax.random.uniform(k1, act_z.shape) <= noise_rate
        noise = (jax.random.uniform(k2, act_z.shape) - 0.5) / lv
        q_act = jnp.where(mask, act_z + noise, q_act)
    q_z = q_act * 2.0 - 1.0
    _, indices, li = quantize(jax.lax.stop_gradient(z), levels, act=act,
                              special_edge=special_edge)
    return q_z.astype(z.dtype), indices, li


def indices_to_level_indices(indices: jnp.ndarray, levels: tuple[int, ...]) -> jnp.ndarray:
    """Mixed-radix unpack: (...) int -> (..., D) int32."""
    lv_i = jnp.asarray(levels, dtype=jnp.int32)
    _, basis = _levels_arrays(levels)
    return (indices[..., None] // basis) % lv_i


def indices_to_codes(indices: jnp.ndarray, levels: tuple[int, ...], *,
                     special_edge: bool = True,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Closed-form decode: indices (...) -> codes (..., D) in [-1, 1]."""
    lv, _ = _levels_arrays(levels)
    li = indices_to_level_indices(indices, levels).astype(jnp.float32)
    if special_edge:
        q_act = li / (lv - 1.0)
    else:
        q_act = (li + 0.5) / lv
    return (q_act * 2.0 - 1.0).astype(dtype)


def codebook_size(levels: tuple[int, ...]) -> int:
    return math.prod(levels)
