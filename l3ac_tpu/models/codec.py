"""Codec assembly: encoder -> en_encoder -> FSQ -> en_decoder -> decoder.

Functional equivalents of the reference ``Codec`` (``l3ac/codec.py:39-122``) and
``EnCodec`` (``l3ac/en_codec.py:23-72``). All functions are pure:
``params`` pytree in, arrays out; jit/pjit-friendly with the ModelConfig as a
static argument.

Layout: audio is (B, T) float; features are channels-last (B, T', C)
throughout (the reference's (B, C, T) permutes are layout-only).
"""

import math

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import local_transformer as lt
from .decoder import decoder_apply, init_decoder
from .encoder import encoder_apply, init_encoder
from .quantizer import indices_to_features, init_quantizer, quantizer_apply


def init_codec(key, mc: ModelConfig, dtype=jnp.float32) -> dict:
    k_enc, k_vq, k_dec, k_ee, k_ed = jax.random.split(key, 5)
    p = {
        "encoder": init_encoder(k_enc, mc, dtype),
        "quantizer": init_quantizer(k_vq, mc.feature_dim, mc.vq, dtype),
        "decoder": init_decoder(k_dec, mc, dtype),
    }
    if mc.uses_compressed_transformer:
        p["en_encoder"] = lt.init_compressed_encoder(k_ee, mc, dtype)
        p["en_decoder"] = lt.init_compressed_decoder(k_ed, mc, dtype)
    else:
        p["en_encoder"] = lt.init_local_trans(k_ee, lt.plain_encoder_config(mc), dtype)
        p["en_decoder"] = lt.init_local_trans(k_ed, lt.plain_decoder_config(mc), dtype)
    return p


def attach_bias_caches(params: dict, mc: ModelConfig) -> dict:
    """Precompute every transformer stack's DynamicPositionBias into the
    params pytree (``lt.attach_bias_cache``) — the inference-time fast path
    used by zoo/serving/bench. Values are bit-identical to the in-forward
    build; training inits skip this so gradients flow through the MLP."""
    params = dict(params)
    if mc.uses_compressed_transformer:
        ecf = lt.compressed_encoder_configs(mc)
        dcf = lt.compressed_decoder_configs(mc)
        ee = dict(params["en_encoder"])
        ee["down_trans"] = lt.attach_bias_cache(ee["down_trans"], ecf["down"])
        ee["post_trans"] = lt.attach_bias_cache(ee["post_trans"], ecf["post"])
        ed = dict(params["en_decoder"])
        ed["pre_trans"] = lt.attach_bias_cache(ed["pre_trans"], dcf["pre"])
        ed["up_trans"] = lt.attach_bias_cache(ed["up_trans"], dcf["up"])
    else:
        ee = lt.attach_bias_cache(params["en_encoder"],
                                  lt.plain_encoder_config(mc))
        ed = lt.attach_bias_cache(params["en_decoder"],
                                  lt.plain_decoder_config(mc))
    params["en_encoder"] = ee
    params["en_decoder"] = ed
    return params


def preprocess(audio: jnp.ndarray, mc: ModelConfig):
    """Right-pad (B, T) audio to a hop multiple (reference ``l3ac/codec.py:79-84``)."""
    length = audio.shape[-1]
    pad = math.ceil(length / mc.hop_length) * mc.hop_length - length
    if pad:
        audio = jnp.pad(audio, ((0, 0), (0, pad)))
    return audio, length


def en_encoder_apply(p: dict, feature: jnp.ndarray, mc: ModelConfig) -> jnp.ndarray:
    if mc.uses_compressed_transformer:
        return lt.compressed_encoder_apply(p, feature, mc)
    return lt.local_trans_apply(p, feature, lt.plain_encoder_config(mc))


def en_decoder_apply(p: dict, feature: jnp.ndarray, mc: ModelConfig) -> jnp.ndarray:
    if mc.uses_compressed_transformer:
        return lt.compressed_decoder_apply(p, feature, mc)
    return lt.local_trans_apply(p, feature, lt.plain_decoder_config(mc))


def encode(params: dict, audio: jnp.ndarray, mc: ModelConfig):
    """(B, T) padded audio -> (q_trans_feature (B, T'', C), indices (B, T'')).

    Matches ``L3AC.encode_audio`` (``l3ac/__init__.py:108-114``).
    """
    feature = encoder_apply(params["encoder"], audio[..., None], mc)
    trans_feature = en_encoder_apply(params["en_encoder"], feature, mc)
    q, indices, _ = quantizer_apply(params["quantizer"], trans_feature, mc.vq)
    return q, indices


def decode(params: dict, q_trans_feature: jnp.ndarray, mc: ModelConfig) -> jnp.ndarray:
    """(B, T'', C) quantized features -> (B, T) audio.

    Matches ``L3AC.decode_audio`` (``l3ac/__init__.py:116-121``).
    """
    q_feature = en_decoder_apply(params["en_decoder"], q_trans_feature, mc)
    audio = decoder_apply(params["decoder"], q_feature, mc)
    return audio[..., 0]


def decode_indices(params: dict, indices: jnp.ndarray, mc: ModelConfig) -> jnp.ndarray:
    # FSQ unpack is integer-exact in any float dtype; emit codes in the params'
    # ambient dtype so bf16 checkpoints decode without a dtype clash.
    dtype = jax.tree_util.tree_leaves(params["decoder"])[0].dtype
    feat = indices_to_features(params["quantizer"], indices, mc.vq, dtype=dtype)
    return decode(params, feat, mc)


def sp_time_quantum(mc: ModelConfig) -> int:
    """Per-shard sample granularity for sequence parallelism.

    Each sp shard's audio length must be a multiple of ``hop_length *
    en_coder_window_size``: hop-divisibility keeps every strided conv's grid
    from straddling a shard boundary, and window-divisibility keeps the global
    local-attention window grid aligned across shards (every transformer stage's
    window divides this quantum at its own rate — DownTrans runs at the conv
    token rate with window ``win * rate``, the post/pre stacks at the token rate
    with window ``win``; both divide ``hop * win`` samples exactly).
    """
    return mc.hop_length * mc.en_coder_window_size


def _check_sp_len(T: int, mc: ModelConfig, n_sp: int, what: str, per_shard: int):
    if T % (per_shard * n_sp):
        raise ValueError(
            f"{what} length {T} must be a multiple of {per_shard * n_sp} "
            f"({n_sp} sp shards x quantum {per_shard}); pad/chunk the input "
            f"(see runtime.chunk) before the sp call")


def encode_sp(params: dict, audio: jnp.ndarray, mc: ModelConfig, mesh, *,
              axis_name: str = "sp", batch_axis: str | None = None):
    """:func:`encode` with the time axis sharded over ``mesh[axis_name]``.

    The TPU-idiomatic replacement for the reference's sequential ``ChunkData``
    streaming (``l3ac/codec.py:124-188``): instead of chunking with a 1-hop
    prefix (an *approximation* — the prefix is smaller than the receptive
    field), the time axis is sharded across chips and every op exchanges
    exactly the halo it needs (``parallel.sp``), so the sharded result equals
    the monolithic one to float tolerance and FSQ indices exactly.

    audio: (B, T) already padded; T must be a multiple of
    ``sp_time_quantum(mc) * n_sp``. Optionally shard batch over ``batch_axis``.
    Returns (q_trans_feature, indices) with the same sharding over time.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import sp as spx

    n_sp = mesh.shape[axis_name]
    _check_sp_len(audio.shape[-1], mc, n_sp, "audio", sp_time_quantum(mc))

    def body(p, a):
        with spx.sequence_parallel(axis_name):
            return encode(p, a, mc)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis_name)),
        out_specs=(P(batch_axis, axis_name, None), P(batch_axis, axis_name)),
        # the Pallas kernels' out_shapes carry no vma annotations; collectives
        # are hand-placed (parallel.sp), so the varying-axis checker is off
        check_vma=False,
    )(params, audio)


def decode_sp(params: dict, q_trans_feature: jnp.ndarray, mc: ModelConfig,
              mesh, *, axis_name: str = "sp",
              batch_axis: str | None = None) -> jnp.ndarray:
    """:func:`decode` with the token time axis sharded over ``mesh[axis_name]``.

    q_trans_feature: (B, T'', C); T'' must be a multiple of
    ``en_coder_window_size * n_sp``. Returns (B, T) audio, time-sharded.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import sp as spx

    n_sp = mesh.shape[axis_name]
    _check_sp_len(q_trans_feature.shape[1], mc, n_sp, "token",
                  mc.en_coder_window_size)

    def body(p, q):
        with spx.sequence_parallel(axis_name):
            return decode(p, q, mc)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis_name, None)),
        out_specs=P(batch_axis, axis_name),
        check_vma=False,
    )(params, q_trans_feature)


def decode_indices_sp(params: dict, indices: jnp.ndarray, mc: ModelConfig,
                      mesh, *, axis_name: str = "sp",
                      batch_axis: str | None = None) -> jnp.ndarray:
    """:func:`decode_indices` with the token time axis sharded (FSQ unpack is
    pointwise over time, so it shards trivially; the transformer/conv decode
    halo-exchanges)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import sp as spx

    n_sp = mesh.shape[axis_name]
    _check_sp_len(indices.shape[1], mc, n_sp, "token", mc.en_coder_window_size)

    def body(p, idx):
        with spx.sequence_parallel(axis_name):
            return decode_indices(p, idx, mc)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis_name)),
        out_specs=P(batch_axis, axis_name),
        check_vma=False,
    )(params, indices)


def forward(params: dict, audio: jnp.ndarray, mc: ModelConfig, *,
            training: bool = False, rng=None,
            drop_path_rate: float = 0.0) -> dict:
    """Training-style round trip returning the reference's output dict
    (``EnCodec.forward``, ``l3ac/en_codec.py:53-72``). ``rng`` enables the
    train-time FSQ noise injection and, with ``drop_path_rate > 0``, the
    conv stages' stochastic depth (reference wires the rate at
    ``l3ac/codec.py:46-56``; released configs use 0)."""
    if rng is not None:
        rng, k_enc, k_dec = jax.random.split(rng, 3)
    else:
        k_enc = k_dec = None
    padded, length = preprocess(audio, mc)
    feature = encoder_apply(params["encoder"], padded[..., None], mc,
                            drop_path_rate=drop_path_rate, rng=k_enc)
    trans_feature = en_encoder_apply(params["en_encoder"], feature, mc)
    q_trans, indices, _ = quantizer_apply(params["quantizer"], trans_feature,
                                          mc.vq, training=training, rng=rng)
    q_feature = en_decoder_apply(params["en_decoder"], q_trans, mc)
    y = decoder_apply(params["decoder"], q_feature, mc,
                      drop_path_rate=drop_path_rate, rng=k_dec)[..., 0]
    return {
        "generated_audio": y[..., :length],
        "embedded_audio": q_feature,
        "indices": indices,
        "commit_loss": jnp.zeros((), audio.dtype),
        "hidden_feature": {
            "encoded_feature": feature,
            "encoded_trans_feature": trans_feature,
            "quantized_trans_feature": q_trans,
            "quantized_feature": q_feature,
        },
    }
