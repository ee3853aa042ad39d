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
from ..ops import transposed as tx
from ..utils import init as pinit
from .layers import (init_conv_unit, residual_conv_unit_apply,
                     residual_conv_unit_apply_t, init_legacy_unit,
                     residual_legacy_unit_apply, legacy_unit_apply_t)
from .tconv import (init_enhance_block, enhance_block_apply,
                    enhance_block_apply_t)

TAIL_DILATIONS = (1, 3, 9)

# Stages whose working dim is at or below this run in transposed (B, C, T)
# layout: time in lanes instead of 24-96 channels padded to 128 lanes (>5x
# wasted HBM traffic at the near-audio-rate sequence lengths).
NARROW_MAX_C = 96


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


def _up_path(stage: dict, h: jnp.ndarray, stride: int, in_t: bool, *,
             phase_split: bool = False):
    """Stage up path: 1x1 conv -> linear upsample x stride -> ChannelNorm.

    Dispatches to the fused Pallas kernel (``ops/pallas/upsample.py``) on
    accelerators; jnp chain otherwise. Under SP the kernel consumes neighbor
    boundary columns (torch's edge clamp applies only at the global edges).

    ``phase_split=True`` (transposed kernel branch only): return the kernel's
    finished phase arrays as a tuple instead of interleaving — the caller
    checks ``isinstance(ret, tuple)`` and feeds the polyphase tail; any
    fallback branch returns the interleaved array as usual.
    """
    from ..ops import pallas as pk
    from ..parallel import sp
    axis = 2 if in_t else 1
    if pk.enabled() and "w" in stage["up_conv"] and stride > 1:
        if sp.active():
            lh, rh = sp.halo_blocks(h, 1, 1, axis=axis)
            edge = sp.edge_flags()
            first = jax.lax.slice_in_dim(h, 0, 1, axis=axis)
            last = jax.lax.slice_in_dim(h, h.shape[axis] - 1, h.shape[axis],
                                        axis=axis)
            lh = jnp.where(edge[0] == 1, first, lh)
            rh = jnp.where(edge[1] == 1, last, rh)
        else:
            lh = rh = None
        nw = stage["up_norm"]["w"] if "up_norm" in stage else None
        nb = stage["up_norm"]["b"] if "up_norm" in stage else None
        if in_t:
            return pk.upsample.up_fused_ct(
                h, stage["up_conv"]["w"], stage["up_conv"]["b"], nw, nb,
                scale=stride, lh=lh, rh=rh, interpret=pk.interpret_default(),
                phase_split=phase_split)
        return pk.upsample.up_fused(
            h, stage["up_conv"]["w"], stage["up_conv"]["b"], nw, nb,
            scale=stride, lh=lh, rh=rh, interpret=pk.interpret_default())
    if in_t:
        h = tx.conv1x1_t(h, stage["up_conv"]["w"], stage["up_conv"]["b"])
        h = tx.upsample_linear_t(h, stride)
        if "up_norm" in stage:
            h = tx.channel_norm_t(h, stage["up_norm"]["w"],
                                  stage["up_norm"]["b"])
    else:
        h = conv1d(h, stage["up_conv"]["w"], stage["up_conv"]["b"])
        h = upsample_linear(h, stride)
        if "up_norm" in stage:
            h = channel_norm(h, stage["up_norm"]["w"], stage["up_norm"]["b"])
    return h


def decoder_apply(p: dict, x: jnp.ndarray, mc: ModelConfig, *,
                  drop_path_rate: float = 0.0, rng=None,
                  tail_high_precision: bool = False) -> jnp.ndarray:
    """x: (B, T', feature_dim) -> (B, T' * prod(decode_rates), 1).

    Wide stages run channels-last; once the working dim drops to
    ``NARROW_MAX_C`` the activation flips to (B, C, T) ONCE and every
    remaining op (units, enhance gate, up path, tail) runs lane-packed in
    that layout.

    ``drop_path_rate``/``rng``: train-only stochastic depth, linspace ramp
    rate -> 0 across stage units; the tail always runs at rate 0 (reference
    ``l3ac/modules.py:153,172-187``).
    """
    from ..ops import pallas as pk
    from ..ops import droppath
    dp = iter(droppath.schedule(drop_path_rate, sum(mc.decoder_depths), rng,
                                ascending=False))
    h = conv1d(x, p["in_conv"]["w"], p["in_conv"]["b"], padding=1)
    in_t = False
    # polyphase fast path: when the last stage's fused up kernel runs at
    # stride 2 and feeds the fused legacy tail, hand the tail the kernel's
    # phase-split outputs directly — the stage-3 lane interleave and the
    # tail's re-read of it disappear (all released configs end in stride 2)
    want_poly = (mc.decoder_last_layer == "legacy" and pk.enabled()
                 and not tail_high_precision and mc.decode_rates
                 and mc.decode_rates[-1] == 2)
    phases = None
    n_stages = len(p["stages"])
    for si, (stage, stride, i_d) in enumerate(zip(p["stages"],
                                                  mc.decode_rates,
                                                  mc.decoder_dims[:-1])):
        if not in_t and i_d <= NARROW_MAX_C:
            h = tx.to_t(h)
            in_t = True
        if in_t:
            for unit in stage["units"]:
                r, k = next(dp)
                h = residual_conv_unit_apply_t(unit, h, drop_rate=r, rng=k)
            h = enhance_block_apply_t(stage["enhance"], h)
            ret = _up_path(stage, h, stride, in_t=True,
                           phase_split=want_poly and si == n_stages - 1)
            if isinstance(ret, tuple):
                phases = ret
            else:
                h = ret
        else:
            for unit in stage["units"]:
                r, k = next(dp)
                h = residual_conv_unit_apply(unit, h, drop_rate=r, rng=k)
            h = enhance_block_apply(stage["enhance"], h)
            h = _up_path(stage, h, stride, in_t=False)

    if not in_t:  # tiny/debug geometries that never narrow
        h = tx.to_t(h)

    # Reference LastBlock fp64 flag (l3ac/modules.py:119-132): the whole tail
    # (tail units + snake + out conv + tanh) runs in float64 and the result is
    # cast back to the ambient dtype. OFF in every released config
    # (modules.py:196); present for 100% component coverage. True float64
    # requires jax_enable_x64 (otherwise jnp silently degrades f64 -> f32,
    # which equals the OFF path). The fp64 tail takes the jnp route — the
    # Pallas tail kernel is bf16/f32-only by design.
    ambient = h.dtype
    if tail_high_precision:
        cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.float64), t)
        h = h.astype(jnp.float64)
        p = dict(p, tail_units=cast(p["tail_units"]),
                 tail_alpha=cast(p["tail_alpha"]),
                 out_conv=cast(p["out_conv"]))

    if mc.decoder_last_layer == "legacy":
        if phases is not None:
            from ..parallel import sp
            x0, x1 = phases
            ph = pk.legacy_tail.PHALO
            if sp.active():
                lh0, rh0 = sp.halo_blocks(x0, ph, ph, axis=2)
                lh1, rh1 = sp.halo_blocks(x1, ph, ph, axis=2)
                return pk.legacy_tail.legacy_tail_poly_ct(
                    x0, x1, p["tail_units"], p["tail_alpha"], p["out_conv"],
                    lh=(lh0, lh1), rh=(rh0, rh1), edges=sp.edge_flags(),
                    interpret=pk.interpret_default())
            return pk.legacy_tail.legacy_tail_poly_ct(
                x0, x1, p["tail_units"], p["tail_alpha"], p["out_conv"],
                interpret=pk.interpret_default())
        if pk.enabled() and not tail_high_precision:
            # whole tail (3 legacy units + snake + out conv + tanh) fused
            from ..parallel import sp
            if sp.active():
                th = pk.legacy_tail.HALO
                lh, rh = sp.halo_blocks(h, th, th, axis=2)
                return pk.legacy_tail.legacy_tail_ct(
                    h, p["tail_units"], p["tail_alpha"], p["out_conv"],
                    lh=lh, rh=rh, edges=sp.edge_flags(),
                    interpret=pk.interpret_default())
            return pk.legacy_tail.legacy_tail_ct(
                h, p["tail_units"], p["tail_alpha"], p["out_conv"],
                interpret=pk.interpret_default())
        for unit, d in zip(p["tail_units"], TAIL_DILATIONS):
            h = h + legacy_unit_apply_t(unit, h, dilation=d)
    elif mc.decoder_last_layer == "dilation":
        for unit, d in zip(p["tail_units"], TAIL_DILATIONS):
            h = residual_conv_unit_apply_t(unit, h, dilation=d)
    else:
        for unit in p["tail_units"]:
            h = residual_conv_unit_apply_t(unit, h)

    h = tx.snake_t(h, p["tail_alpha"])
    h = tx.conv1d_t(h, p["out_conv"]["w"], p["out_conv"]["b"], padding=3)
    h = jnp.tanh(h).astype(ambient)
    return h.reshape(h.shape[0], h.shape[2], 1)
