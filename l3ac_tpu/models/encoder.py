"""Conv encoder: audio (B, T, 1) -> features (B, T/hop, feature_dim).

Mirrors the reference Encoder (``l3ac/modules.py:71-116``): FirstBlock stem, then
per stage depth x residual ConvUnits + strided downsampling conv (+ optional
ChannelNorm), final ConvUnits and a k=3 projection to feature_dim. NOT causal —
symmetric padding throughout, matching the reference.

TPU notes: all downsampling convs have kernel_size == stride (non-overlapping)
and are lowered to reshape+matmul on the MXU.
"""

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import conv1d, channel_norm
from ..ops import transposed as tx
from ..ops.conv import conv1d_strided_matmul
from ..utils import init as pinit
from .decoder import NARROW_MAX_C
from .layers import (init_conv_unit, residual_conv_unit_apply,
                     residual_conv_unit_apply_t)
from .tconv import init_first_block, first_block_apply


def init_encoder(key, mc: ModelConfig, dtype=jnp.float32) -> dict:
    dims = mc.encoder_dims
    keys = iter(jax.random.split(key, 256))
    p = {"first": init_first_block(next(keys), dims[0], dtype)}

    stages = []
    for i_d, o_d, stride, depth in zip(dims[:-1], dims[1:], mc.compress_rates,
                                       mc.encoder_depths):
        stage = {
            "units": [init_conv_unit(next(keys), i_d, snake_act=mc.use_snake_act,
                                     use_norm=mc.use_norm, dtype=dtype)
                      for _ in range(depth)],
            "down": pinit.conv_params(next(keys), stride, i_d, o_d, dtype=dtype),
        }
        if mc.use_norm:
            stage["down_norm"] = pinit.norm_params(o_d, dtype)
        stages.append(stage)
    p["stages"] = stages

    p["last_units"] = [init_conv_unit(next(keys), dims[-1],
                                      snake_act=mc.use_snake_act,
                                      use_norm=mc.use_norm, dtype=dtype)
                       for _ in range(mc.encoder_depths[-1])]
    p["out_conv"] = pinit.conv_params(next(keys), 3, dims[-1], mc.feature_dim,
                                      dtype=dtype)
    return p


def encoder_apply(p: dict, x: jnp.ndarray, mc: ModelConfig, *,
                  drop_path_rate: float = 0.0, rng=None) -> jnp.ndarray:
    """x: (B, T, 1) -> (B, T // conv_hop, feature_dim). T must be a hop multiple.

    The stem and narrow stages (dim <= NARROW_MAX_C) run in the transposed
    (B, C, T) lane-packed layout; the strided downsampling convs run as
    channels-last reshape+matmuls (MXU), flipping layout at each boundary —
    the flips happen at successively shorter sequence lengths.

    ``drop_path_rate``/``rng``: train-only stochastic depth, linspace ramp
    0 -> rate across all units (reference ``l3ac/modules.py:89``).
    """
    from ..ops import pallas as pk
    from ..ops import droppath
    from ..parallel import sp
    dp = iter(droppath.schedule(drop_path_rate, sum(mc.encoder_depths), rng,
                                ascending=True))
    if pk.enabled():
        # fused stem emits the transposed layout directly
        if sp.active():
            fb_halo = pk.first_block.HALO
            lh, rh = sp.halo_blocks(x, fb_halo, fb_halo, axis=1)
            h = pk.first_block.first_block_ct(
                x, p["first"], lh=lh, rh=rh, edges=sp.edge_flags(),
                interpret=pk.interpret_default())
        else:
            h = pk.first_block.first_block_ct(
                x, p["first"], interpret=pk.interpret_default())
        in_t = True
    else:
        h = first_block_apply(p["first"], x)
        in_t = False
    for stage, stride, i_d in zip(p["stages"], mc.compress_rates,
                                  mc.encoder_dims[:-1]):
        narrow = i_d <= NARROW_MAX_C
        if narrow and not in_t:
            h = tx.to_t(h)
            in_t = True
        elif not narrow and in_t:
            h = tx.from_t(h)
            in_t = False
        if in_t:
            for unit in stage["units"]:
                r, k = next(dp)
                h = residual_conv_unit_apply_t(unit, h, drop_rate=r, rng=k)
            # stay lane-packed through the downsample: no layout round-trip
            # at the (raw-audio-rate) stage boundaries
            h = tx.conv1d_strided_matmul_t(h, stage["down"]["w"],
                                           stage["down"]["b"])
            if "down_norm" in stage:
                h = tx.channel_norm_t(h, stage["down_norm"]["w"],
                                      stage["down_norm"]["b"])
        else:
            for unit in stage["units"]:
                r, k = next(dp)
                h = residual_conv_unit_apply(unit, h, drop_rate=r, rng=k)
            h = conv1d_strided_matmul(h, stage["down"]["w"], stage["down"]["b"])
            if "down_norm" in stage:
                h = channel_norm(h, stage["down_norm"]["w"],
                                 stage["down_norm"]["b"])
    if in_t:
        h = tx.from_t(h)
    for unit in p["last_units"]:
        r, k = next(dp)
        h = residual_conv_unit_apply(unit, h, drop_rate=r, rng=k)
    return conv1d(h, p["out_conv"]["w"], p["out_conv"]["b"], padding=1)
