"""Conv decoder: features (B, T', feature_dim) -> audio (B, T'*hop, 1).

Mirrors the reference Decoder (``l3ac/modules.py:135-201``): k=3 head conv, then
per stage depth x residual ConvUnits -> EnhanceBlock -> [1x1 conv + linear
Upsample + optional ChannelNorm], then the 'legacy' tail (3 x residual
LegacyUnits at dilations 1/3/9) -> Snake -> Conv(k=7) -> Tanh. The reference's
fp64 LastBlock flag exists but is OFF (``l3ac/modules.py:196``); we run the tail
in the ambient dtype accordingly.

This is the FLOP-dominant module (8.5M params up to near-audio-rate resolution,
SURVEY.md §3.3): the dims[0]=512 stage runs at token rate, everything widens
toward audio rate. Pointwise convs are matmuls on the MXU; the linear upsample
is a phase-decomposed elementwise blend (no gather).
"""

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import conv1d, channel_norm, snake, upsample_linear
from ..utils import init as pinit
from .layers import (init_conv_unit, residual_conv_unit_apply,
                     init_legacy_unit, residual_legacy_unit_apply)
from .tconv import init_enhance_block, enhance_block_apply

TAIL_DILATIONS = (1, 3, 9)


def init_decoder(key, mc: ModelConfig, dtype=jnp.float32) -> dict:
    dims = mc.decoder_dims
    keys = iter(jax.random.split(key, 256))
    p = {"in_conv": pinit.conv_params(next(keys), 3, mc.feature_dim, dims[0],
                                      dtype=dtype)}
    stages = []
    for i_d, o_d, stride, depth in zip(dims[:-1], dims[1:], mc.decode_rates,
                                       mc.decoder_depths):
        stage = {
            "units": [init_conv_unit(next(keys), i_d, snake_act=mc.use_snake_act,
                                     use_norm=mc.use_norm, dtype=dtype)
                      for _ in range(depth)],
            "enhance": init_enhance_block(next(keys), i_d, dtype),
            "up_conv": pinit.conv_params(next(keys), 1, i_d, o_d, dtype=dtype),
        }
        if mc.use_norm:
            stage["up_norm"] = pinit.norm_params(o_d, dtype)
        stages.append(stage)
    p["stages"] = stages

    tail_dim = dims[-1]
    if mc.decoder_last_layer is None:
        p["tail_units"] = [init_conv_unit(next(keys), tail_dim,
                                          snake_act=mc.use_snake_act,
                                          use_norm=mc.use_norm, dtype=dtype)
                           for _ in range(2)]
    elif mc.decoder_last_layer == "legacy":
        p["tail_units"] = [init_legacy_unit(next(keys), tail_dim, dilation=d,
                                            dtype=dtype) for d in TAIL_DILATIONS]
    elif mc.decoder_last_layer == "dilation":
        p["tail_units"] = [init_conv_unit(next(keys), tail_dim,
                                          snake_act=mc.use_snake_act,
                                          use_norm=mc.use_norm, dilation=d,
                                          dtype=dtype) for d in TAIL_DILATIONS]
    else:
        raise NotImplementedError(mc.decoder_last_layer)

    p["tail_alpha"] = jnp.ones((tail_dim,), dtype)
    p["out_conv"] = pinit.conv_params(next(keys), 7, tail_dim, 1, dtype=dtype)
    return p


def decoder_apply(p: dict, x: jnp.ndarray, mc: ModelConfig) -> jnp.ndarray:
    """x: (B, T', feature_dim) -> (B, T' * prod(decode_rates), 1)."""
    h = conv1d(x, p["in_conv"]["w"], p["in_conv"]["b"], padding=1)
    for stage, stride in zip(p["stages"], mc.decode_rates):
        for unit in stage["units"]:
            h = residual_conv_unit_apply(unit, h)
        h = enhance_block_apply(stage["enhance"], h)
        h = conv1d(h, stage["up_conv"]["w"], stage["up_conv"]["b"])
        h = upsample_linear(h, stride)
        if "up_norm" in stage:
            h = channel_norm(h, stage["up_norm"]["w"], stage["up_norm"]["b"])

    if mc.decoder_last_layer == "legacy":
        from ..ops import pallas as pk
        if pk.enabled():
            # whole tail (3 legacy units + snake + out conv + tanh) fused
            return pk.legacy_tail.legacy_tail(h, p["tail_units"],
                                              p["tail_alpha"], p["out_conv"])
        for unit, d in zip(p["tail_units"], TAIL_DILATIONS):
            h = residual_legacy_unit_apply(unit, h, dilation=d)
    elif mc.decoder_last_layer == "dilation":
        for unit, d in zip(p["tail_units"], TAIL_DILATIONS):
            h = residual_conv_unit_apply(unit, h, dilation=d)
    else:
        for unit in p["tail_units"]:
            h = residual_conv_unit_apply(unit, h)

    h = snake(h, p["tail_alpha"])
    h = conv1d(h, p["out_conv"]["w"], p["out_conv"]["b"], padding=3)
    return jnp.tanh(h)
