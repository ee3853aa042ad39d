"""Pallas kernels vs their jnp reference implementations (interpret mode on CPU;
the same kernels compile natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l3ac_tpu.ops import attention as ref_attn
from l3ac_tpu.ops.pallas import local_attention as pl_attn

RNG = np.random.default_rng(13)


@pytest.mark.parametrize("B,H,T,D,n", [
    (2, 3, 64, 16, 16),
    (1, 6, 96, 32, 24),
])
def test_pallas_local_attention_matches_reference(B, H, T, D, n):
    q = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))

    want = ref_attn.local_attention(q, k, v, window_size=n)
    got = pl_attn.local_attention(q, k, v, window_size=n, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("B,T,C,use_norm", [
    (2, 300, 32, True),
    (2, 257, 16, False),
])
def test_pallas_conv_unit_matches_reference(B, T, C, use_norm):
    from l3ac_tpu.models.layers import init_conv_unit, conv_unit_apply
    from l3ac_tpu.ops.pallas.conv_unit import conv_unit
    p = init_conv_unit(jax.random.PRNGKey(0), C, snake_act=True,
                       use_norm=use_norm)
    x = jnp.asarray(RNG.standard_normal((B, T, C)).astype(np.float32))
    want = x + conv_unit_apply(p, x)
    got = conv_unit(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_legacy_tail_matches_reference():
    from l3ac_tpu.config import get_config
    from l3ac_tpu.models.decoder import init_decoder
    from l3ac_tpu.models.layers import residual_legacy_unit_apply
    from l3ac_tpu.ops import conv1d, snake
    from l3ac_tpu.ops.pallas.legacy_tail import legacy_tail

    mc = get_config("debug").network_config
    p = init_decoder(jax.random.PRNGKey(3), mc)
    C = mc.decoder_dims[-1]
    x = jnp.asarray(RNG.standard_normal((2, 5000, C)).astype(np.float32)) * 0.5
    h = x
    for u, d in zip(p["tail_units"], (1, 3, 9)):
        h = residual_legacy_unit_apply(u, h, dilation=d)
    want = jnp.tanh(conv1d(snake(h, p["tail_alpha"]), p["out_conv"]["w"],
                           p["out_conv"]["b"], padding=3))
    got = legacy_tail(x, p["tail_units"], p["tail_alpha"], p["out_conv"],
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,T", [(2, 5000), (2, 300)])
def test_pallas_first_block_matches_reference(B, T):
    from l3ac_tpu.models.tconv import init_first_block, first_block_apply
    from l3ac_tpu.ops.pallas.first_block import first_block
    p = init_first_block(jax.random.PRNGKey(0), 24)
    x = jnp.asarray(RNG.standard_normal((B, T, 1)).astype(np.float32))
    want = first_block_apply(p, x)
    got = first_block(x, p, interpret=True)
    # sequential (vs tree) summation in the 45-tap average pool costs ~1e-4;
    # well inside bf16 inference tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("n,T", [(512, 1024), (450, 900)])
def test_pallas_local_attention_row_tiled(n, T):
    """Large windows take the query-row-tiled path (rq=256), including the
    padded-n case (450 -> 512) where out-of-window query rows are cropped."""
    from l3ac_tpu.ops.pallas.local_attention import _row_tile
    rq, n_pad = _row_tile(n)
    assert rq == 256 and n_pad == 512

    B, H, D = 1, 2, 32
    q = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))
    bias = jnp.asarray(RNG.standard_normal((H, n, 2 * n)).astype(np.float32))

    want = ref_attn.local_attention(q, k, v, window_size=n, bias=bias)
    got = pl_attn.local_attention(q, k, v, window_size=n, bias=bias,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_local_attention_with_bias():
    B, H, T, D, n = 1, 6, 48, 32, 16
    q = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((B, H, T, D)).astype(np.float32))
    bias = jnp.asarray(RNG.standard_normal((H, n, 2 * n)).astype(np.float32))

    want = ref_attn.local_attention(q, k, v, window_size=n, bias=bias)
    got = pl_attn.local_attention(q, k, v, window_size=n, bias=bias,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("M,K,N,bias", [
    (5, 64, 32, True),       # ragged M (pad/crop path)
    (512, 128, 576, False),  # qkv geometry at 1kbps
])
def test_pallas_int8_matmul_matches_reference(M, K, N, bias):
    from l3ac_tpu.ops import quantized
    from l3ac_tpu.ops.pallas import int8_matmul as pk_q

    x = jnp.asarray(RNG.standard_normal((2, M, K)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((K, N)).astype(np.float32)) * 0.05
    b = (jnp.asarray(RNG.standard_normal((N,)).astype(np.float32))
         if bias else None)
    w_q, scale = quantized.quantize_weight(w)

    want = x @ quantized.dequantize_weight(w_q, scale, jnp.float32)
    if bias:
        want = want + b
    got = pk_q.int8_matmul(x, w_q, scale, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_poly_sine_accuracy():
    """The opt-in fast sine (L3AC_TPU_FAST_SINE, ops/pallas/_math.sin_poly)
    must stay within a few fp32 ulps of true sine across the realistic snake
    input range (|alpha*h| up to ~1e3) — the documented ~6.4e-7 bound."""
    from l3ac_tpu.ops.pallas import _math
    for scale in (1.0, 3.0, 30.0, 300.0):
        v = jnp.asarray((RNG.standard_normal(500_000) * scale)
                        .astype(np.float32))
        got = np.asarray(_math.sin_poly(v), np.float64)
        want = np.sin(np.asarray(v, np.float64))
        assert np.abs(got - want).max() < 1e-6, scale
    # snake built on it: default mode is EXACT jnp.sin
    import os
    assert not os.environ.get("L3AC_TPU_FAST_SINE"), \
        "tests must run with exact sine (bit-exactness contracts)"
    h = jnp.asarray(RNG.standard_normal((64, 256)).astype(np.float32))
    a = jnp.abs(jnp.asarray(RNG.standard_normal(256).astype(np.float32))) + 0.5
    want = h + jnp.sin(a * h) ** 2 / (a + 1e-8)
    np.testing.assert_array_equal(np.asarray(_math.snake(h, a)),
                                  np.asarray(want))


@pytest.mark.parametrize("scale,T,Ci,Co,norm", [
    (5, 300, 128, 64, True),
    (3, 257, 96, 48, True),
    (2, 300, 48, 24, False),
])
def test_pallas_up_fused_matches_reference(scale, T, Ci, Co, norm):
    """Fused 1x1-conv + linear-upsample + ChannelNorm vs the jnp chain,
    both layouts (reference chain: l3ac/modules.py:155-166)."""
    from l3ac_tpu.ops import conv1d, upsample_linear, channel_norm
    from l3ac_tpu.ops import transposed as tx
    from l3ac_tpu.ops.pallas import upsample as pk_up
    k = jax.random.PRNGKey(scale)
    x = jnp.asarray(RNG.standard_normal((2, T, Ci)).astype(np.float32))
    w = jax.random.normal(k, (1, Ci, Co), jnp.float32) * 0.1
    b = jax.random.normal(k, (Co,), jnp.float32) * 0.1
    nw = jnp.ones((Co,)) * 1.3 if norm else None
    nb = jnp.ones((Co,)) * 0.2 if norm else None

    want = upsample_linear(conv1d(x, w, b), scale)
    if norm:
        want = channel_norm(want, nw, nb)
    got = pk_up.up_fused(x, w, b, nw, nb, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    xt = x.transpose(0, 2, 1)
    want_t = tx.upsample_linear_t(tx.conv1x1_t(xt, w, b), scale)
    if norm:
        want_t = tx.channel_norm_t(want_t, nw, nb)
    got_t = pk_up.up_fused_ct(xt, w, b, nw, nb, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-4, atol=1e-5)


def test_pallas_up_fused_halo_sharding():
    """Two half-shards with explicit lh/rh boundary columns concatenate to
    exactly the monolithic result (the SP contract of models/decoder._up_path)."""
    from l3ac_tpu.ops.pallas import upsample as pk_up
    k = jax.random.PRNGKey(7)
    B, Ci, Co, T, scale = 2, 64, 32, 520, 3
    x = jnp.asarray(RNG.standard_normal((B, Ci, T)).astype(np.float32))
    w = jax.random.normal(k, (1, Ci, Co), jnp.float32) * 0.1
    b = jnp.zeros((Co,))
    nw = jnp.ones((Co,))
    nb = jnp.zeros((Co,))

    full = pk_up.up_fused_ct(x, w, b, nw, nb, scale=scale, interpret=True)

    half = T // 2
    xl, xr = x[:, :, :half], x[:, :, half:]
    # shard 0: global-left edge clamps (lh = own first col), rh = neighbor's first
    out_l = pk_up.up_fused_ct(xl, w, b, nw, nb, scale=scale,
                              lh=xl[:, :, :1], rh=xr[:, :, :1], interpret=True)
    # shard 1: lh = neighbor's last col, global-right edge clamps
    out_r = pk_up.up_fused_ct(xr, w, b, nw, nb, scale=scale,
                              lh=xl[:, :, -1:], rh=xr[:, :, -1:], interpret=True)
    got = jnp.concatenate([out_l, out_r], axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_pallas_legacy_tail_poly_matches_interleaved():
    """Polyphase tail (stride-2 phase-split inputs) == interleaved tail ==
    jnp reference; plus the phase_split=True contract of up_fused_ct."""
    from l3ac_tpu.config import get_config
    from l3ac_tpu.models.decoder import init_decoder
    from l3ac_tpu.ops.pallas.legacy_tail import legacy_tail_ct, \
        legacy_tail_poly_ct

    mc = get_config("debug").network_config
    p = init_decoder(jax.random.PRNGKey(3), mc)
    C = mc.decoder_dims[-1]
    T = 5000
    x = jnp.asarray(RNG.standard_normal((2, C, T)).astype(np.float32)) * 0.5

    want = legacy_tail_ct(x, p["tail_units"], p["tail_alpha"], p["out_conv"],
                          interpret=True)
    got = legacy_tail_poly_ct(x[:, :, 0::2], x[:, :, 1::2], p["tail_units"],
                              p["tail_alpha"], p["out_conv"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_up_fused_phase_split_contract():
    from l3ac_tpu.ops.pallas import upsample as pk_up
    k = jax.random.PRNGKey(9)
    B, Ci, Co, T, scale = 2, 48, 24, 700, 2
    x = jnp.asarray(RNG.standard_normal((B, Ci, T)).astype(np.float32))
    w = jax.random.normal(k, (1, Ci, Co), jnp.float32) * 0.1
    b = jnp.zeros((Co,))
    inter = pk_up.up_fused_ct(x, w, b, None, None, scale=scale,
                              interpret=True)
    phases = pk_up.up_fused_ct(x, w, b, None, None, scale=scale,
                               interpret=True, phase_split=True)
    assert len(phases) == scale
    for pi, ph in enumerate(phases):
        np.testing.assert_allclose(np.asarray(ph),
                                   np.asarray(inter[:, :, pi::scale]),
                                   rtol=1e-6, atol=1e-6)


def test_pallas_legacy_tail_poly_halo_sharding():
    """Two half-shards of the polyphase tail with per-phase lh/rh halo
    blocks + edge flags concatenate to the monolithic result (the SP
    contract of models/decoder's phases branch)."""
    from l3ac_tpu.config import get_config
    from l3ac_tpu.models.decoder import init_decoder
    from l3ac_tpu.ops.pallas.legacy_tail import PHALO, legacy_tail_poly_ct

    mc = get_config("debug").network_config
    p = init_decoder(jax.random.PRNGKey(3), mc)
    C = mc.decoder_dims[-1]
    Tt = 2000
    x0 = jnp.asarray(RNG.standard_normal((2, C, Tt)).astype(np.float32)) * 0.5
    x1 = jnp.asarray(RNG.standard_normal((2, C, Tt)).astype(np.float32)) * 0.5
    args = (p["tail_units"], p["tail_alpha"], p["out_conv"])

    full = legacy_tail_poly_ct(x0, x1, *args, interpret=True)

    h = Tt // 2
    zeros = jnp.zeros((2, C, PHALO), x0.dtype)
    out_l = legacy_tail_poly_ct(
        x0[:, :, :h], x1[:, :, :h], *args,
        lh=(zeros, zeros), rh=(x0[:, :, h:h + PHALO], x1[:, :, h:h + PHALO]),
        edges=jnp.asarray([1, 0], jnp.int32), interpret=True)
    out_r = legacy_tail_poly_ct(
        x0[:, :, h:], x1[:, :, h:], *args,
        lh=(x0[:, :, h - PHALO:h], x1[:, :, h - PHALO:h]),
        rh=(zeros, zeros), edges=jnp.asarray([0, 1], jnp.int32),
        interpret=True)
    got = jnp.concatenate([out_l, out_r], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
