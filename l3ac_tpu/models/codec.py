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
    feat = indices_to_features(params["quantizer"], indices, mc.vq)
    return decode(params, feat, mc)


def forward(params: dict, audio: jnp.ndarray, mc: ModelConfig, *,
            training: bool = False, rng=None) -> dict:
    """Training-style round trip returning the reference's output dict
    (``EnCodec.forward``, ``l3ac/en_codec.py:53-72``). ``rng`` enables the
    train-time FSQ noise injection."""
    padded, length = preprocess(audio, mc)
    feature = encoder_apply(params["encoder"], padded[..., None], mc)
    trans_feature = en_encoder_apply(params["en_encoder"], feature, mc)
    q_trans, indices, _ = quantizer_apply(params["quantizer"], trans_feature,
                                          mc.vq, training=training, rng=rng)
    q_feature = en_decoder_apply(params["en_decoder"], q_trans, mc)
    y = decoder_apply(params["decoder"], q_feature, mc)[..., 0]
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
