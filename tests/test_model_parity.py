"""Golden parity: conv encoder/decoder/tconv/quantizer vs the torch reference.

Random-initialized torch reference modules are converted through the
torch->JAX checkpoint converter and compared stage by stage — this exercises
exactly the path real checkpoints will take (state-dict keys, weight-norm
folding, layout transposes).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from l3ac_tpu import get_config
from l3ac_tpu.models import codec as jcodec
from l3ac_tpu.models import tconv as jtconv
from l3ac_tpu.models.decoder import decoder_apply
from l3ac_tpu.models.encoder import encoder_apply
from l3ac_tpu.models.quantizer import indices_to_features, quantizer_apply
from l3ac_tpu.runtime import convert
from tests.oracle import import_reference

l3ac = import_reference()

RNG = np.random.default_rng(42)
MC_1K = get_config("1kbps").network_config


def sd_of(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def make_ref_encoder(mc):
    from l3ac.modules import Encoder
    torch.manual_seed(0)
    return Encoder(feature_dim=mc.feature_dim, dims=mc.encoder_dims,
                   strides=mc.compress_rates, depths=mc.encoder_depths,
                   use_norm=mc.use_norm, use_snake_act=mc.use_snake_act).eval()


def make_ref_decoder(mc):
    from l3ac.modules import Decoder
    torch.manual_seed(1)
    return Decoder(feature_dim=mc.feature_dim, dims=mc.decoder_dims,
                   strides=mc.decode_rates, depths=mc.decoder_depths,
                   use_norm=mc.use_norm, use_snake_act=mc.use_snake_act,
                   decoder_last_layer=mc.decoder_last_layer).eval()


def test_first_block_parity():
    from l3ac.tconv import FirstBlock
    torch.manual_seed(2)
    ref = FirstBlock(24).eval()
    x = RNG.standard_normal((2, 1, 360)).astype(np.float32)
    want = ref(torch.tensor(x)).detach().numpy()

    sd = sd_of(ref)
    p = {
        "base": {"branches": [convert._conv(sd, f"blocks.{i}.1") for i in range(5)]},
        "conv1": convert._conv(sd, "conv_1"),
        "conv2": convert._conv(sd, "conv_2"),
    }
    import jax
    p = jax.tree.map(jnp.asarray, p)
    got = jtconv.first_block_apply(p, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_enhance_block_parity():
    from l3ac.tconv import EnhanceBlock
    torch.manual_seed(3)
    ref = EnhanceBlock(64).eval()
    x = RNG.standard_normal((2, 64, 100)).astype(np.float32)
    want = ref(torch.tensor(x)).detach().numpy()

    sd = sd_of(ref)
    p = {
        "base": {"branches": [convert._conv(sd, f"blocks.{i}.1") for i in range(4)]},
        "in_norm": convert._norm(sd, "merge_layer.0"),
        "merge": convert._conv(sd, "merge_layer.1"),
    }
    import jax
    p = jax.tree.map(jnp.asarray, p)
    got = jtconv.enhance_block_apply(p, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_encoder_parity_1kbps_geometry():
    mc = MC_1K
    ref = make_ref_encoder(mc)
    params = convert.convert_checkpoint({"encoder": sd_of(ref)}, mc)["encoder"]

    x = RNG.standard_normal((2, 1, 2700)).astype(np.float32)
    want = ref(torch.tensor(x)).detach().numpy()        # (2, 128, 30)
    got = encoder_apply(params, jnp.asarray(x.transpose(0, 2, 1)), mc)
    assert got.shape == (2, 30, 128)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-4)


def test_decoder_parity_1kbps_geometry():
    mc = MC_1K
    ref = make_ref_decoder(mc)
    params = convert.convert_checkpoint({"decoder": sd_of(ref)}, mc)["decoder"]

    x = RNG.standard_normal((2, 128, 30)).astype(np.float32)
    want = ref(torch.tensor(x)).detach().numpy()        # (2, 1, 2700)
    got = decoder_apply(params, jnp.asarray(x.transpose(0, 2, 1)), mc)
    assert got.shape == (2, 2700, 1)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-3, atol=1e-4)


def test_quantizer_parity():
    from l3ac.vq import build_vq
    torch.manual_seed(4)
    ref = build_vq(feature_dim=128, name="super_fsq",
                   levels=[7, 7, 7, 7, 7, 7], noise_rate=0.5).eval()
    mc = MC_1K
    params = convert.convert_checkpoint({"quantizer": sd_of(ref)}, mc)["quantizer"]

    x = RNG.standard_normal((2, 30, 128)).astype(np.float32)
    with torch.no_grad():
        q_ref, idx_ref, _ = ref(torch.tensor(x))
    q, idx, _ = quantizer_apply(params, jnp.asarray(x), mc.vq)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref["indices"].numpy())
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), rtol=1e-4, atol=1e-5)

    feats_ref = ref.to_features(idx_ref["indices"]).detach().numpy()
    feats = indices_to_features(params, idx, mc.vq)
    np.testing.assert_allclose(np.asarray(feats), feats_ref, rtol=1e-4, atol=1e-5)


def test_param_counts_match_survey():
    """SURVEY.md Appendix A.1 measures torch-side counts (encoder 869,316 /
    decoder 8,494,082 / vq 1,670). Our params fold weight-norm, so each
    weight-normed layer drops its per-out-channel ``g`` vector: encoder
    -3,900 and decoder -16,361 (verified against the reference modules)."""
    import jax
    mc = MC_1K
    key = jax.random.PRNGKey(0)
    p = jcodec.init_codec(key, mc)

    def count(tree):
        return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))

    assert count(p["encoder"]) == 869_316 - 3_900
    assert count(p["decoder"]) == 8_494_082 - 16_361
    assert count(p["quantizer"]) == 1_670


def test_up_trans_v1_parity():
    """UpTransV1 (reference ``l3ac/local_trans.py:97-111``) — the
    interleave-learned-tokens upsampler. Dead code in the reference (all
    released configs use UpTransV2) but part of the component surface: parity
    against the reference class running on the torch oracle attention."""
    from l3ac.local_trans import UpTransV1
    from l3ac_tpu.models.local_transformer import (TransConfig,
                                                   up_trans_v1_apply)
    torch.manual_seed(7)
    dim, rate, win, depth = 64, 3, 90, 2
    ref = UpTransV1(feature_dim=dim, window_size=win, compress_rate=rate,
                    depth=depth, use_dynamic_pos_bias=True).eval()
    params = convert.convert_up_trans_v1(sd_of(ref), depth=depth, rate=rate)
    tc = TransConfig(dim=dim, depth=depth, window_size=win, dynamic_pos=True)

    x = RNG.standard_normal((2, 50, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()             # (2, 150, 64)
    got = up_trans_v1_apply(params, jnp.asarray(x), tc, rate)
    assert got.shape == want.shape == (2, 50 * rate, dim)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_last_block_high_precision_parity():
    """The reference ``LastBlock`` fp64 flag (``l3ac/modules.py:119-132``) —
    OFF in every released config (``:196``) but part of the component surface.
    Parity of the ON state: torch decoder with its LastBlock flipped to
    float64 vs ``decoder_apply(tail_high_precision=True)`` under x64."""
    import jax

    mc = get_config("debug").network_config
    ref = make_ref_decoder(mc)
    last = ref.blocks[-1]
    last.high_precision = True
    last.to(torch.float64)
    params = convert.convert_checkpoint({"decoder": sd_of(ref)}, mc)["decoder"]

    x = RNG.standard_normal((2, mc.feature_dim, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    xj = jnp.asarray(x.transpose(0, 2, 1))

    jax.config.update("jax_enable_x64", True)
    try:
        got64 = decoder_apply(params, xj, mc, tail_high_precision=True)
    finally:
        jax.config.update("jax_enable_x64", False)
    assert np.asarray(got64).dtype == np.float32        # cast back to ambient
    np.testing.assert_allclose(
        np.asarray(got64).transpose(0, 2, 1), want, rtol=1e-4, atol=1e-5)

    # and the flag is semantics-preserving: ON ~= OFF at fp32 tolerance
    got32 = decoder_apply(params, xj, mc)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(got64),
                               rtol=1e-3, atol=1e-4)
