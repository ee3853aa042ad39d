"""Golden parity of core ops vs the torch reference (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from l3ac_tpu import ops
from tests.oracle import import_reference

l3ac = import_reference()

RNG = np.random.default_rng(0)


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def n(x):
    return np.asarray(x)


def test_snake():
    from l3ac.layers import snake as ref_snake
    x = RNG.standard_normal((2, 37, 16)).astype(np.float32)
    alpha = RNG.uniform(0.5, 2.0, 16).astype(np.float32)
    ref = ref_snake(t(x).permute(0, 2, 1), t(alpha).reshape(1, 16, 1)).permute(0, 2, 1)
    got = ops.snake(jnp.asarray(x), jnp.asarray(alpha))
    np.testing.assert_allclose(n(got), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_channel_norm_both_formats():
    from l3ac.layers import ChannelNorm
    x = RNG.standard_normal((2, 37, 16)).astype(np.float32) * 3
    w = RNG.standard_normal(16).astype(np.float32)
    b = RNG.standard_normal(16).astype(np.float32)

    m_first = ChannelNorm(16, data_format="channels_first")
    m_last = ChannelNorm(16, data_format="channels_last")
    for m in (m_first, m_last):
        with torch.no_grad():
            m.weight.copy_(t(w))
            m.bias.copy_(t(b))
    ref_first = m_first(t(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    ref_last = m_last(t(x)).detach().numpy()

    got = n(ops.channel_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref_first, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got, ref_last, rtol=1e-5, atol=1e-5)


def test_grn_quirk():
    from l3ac.layers import GRN
    x = RNG.standard_normal((3, 29, 8)).astype(np.float32)
    m = GRN(8)  # channels_last
    with torch.no_grad():
        m.gamma.copy_(torch.randn(1, 8))
        m.beta.copy_(torch.randn(1, 8))
    ref = m(t(x)).detach().numpy()
    got = n(ops.grn(jnp.asarray(x),
                    jnp.asarray(m.gamma.detach().numpy().reshape(8)),
                    jnp.asarray(m.beta.detach().numpy().reshape(8))))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k", [1, 3, 5, 9, 11, 21, 45])
def test_trend_pool(k):
    from l3ac.tconv.base import trend_pool as ref_trend_pool
    x = RNG.standard_normal((2, 1, 200)).astype(np.float32)
    ref = ref_trend_pool(t(x), k).numpy()
    got = n(ops.trend_pool(jnp.asarray(x).transpose(0, 2, 1), k)).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("scale", [2, 3, 4, 5])
@pytest.mark.parametrize("T", [7, 30, 101])
def test_upsample_linear(scale, T):
    x = RNG.standard_normal((2, 5, T)).astype(np.float32)
    ref = F.interpolate(t(x), scale_factor=scale, mode="linear",
                        align_corners=False).numpy()
    got = n(ops.upsample_linear(jnp.asarray(x).transpose(0, 2, 1), scale))
    # torch computes source coords as (j+0.5)*float32(1/r)-0.5 per *global* index,
    # accumulating fp32 error linear in j; our phase decomposition uses exact
    # rational weights. Tolerance covers torch's drift on these lengths.
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, rtol=1e-3, atol=2e-4)


def test_instance_norm():
    m = torch.nn.InstanceNorm1d(4, affine=True)
    with torch.no_grad():
        m.weight.copy_(torch.randn(4))
        m.bias.copy_(torch.randn(4))
    x = RNG.standard_normal((2, 4, 50)).astype(np.float32)
    ref = m(t(x)).detach().numpy()
    got = n(ops.instance_norm(jnp.asarray(x).transpose(0, 2, 1),
                              jnp.asarray(m.weight.detach().numpy()),
                              jnp.asarray(m.bias.detach().numpy())))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout,k,stride,dilation,groups", [
    (1, 4, 7, 1, 1, 1),
    (24, 48, 6, 6, 1, 1),
    (48, 96, 5, 5, 1, 1),
    (16, 16, 7, 1, 3, 16),   # depthwise dilated
    (192, 128, 3, 1, 1, 1),
])
def test_conv1d(cin, cout, k, stride, dilation, groups):
    pad = (k - 1) * dilation // 2 if stride == 1 else 0
    conv = torch.nn.Conv1d(cin, cout, k, stride=stride, padding=pad,
                           dilation=dilation, groups=groups)
    T = 60 if stride == 1 else 60 * stride
    x = RNG.standard_normal((2, cin, T)).astype(np.float32)
    ref = conv(t(x)).detach().numpy()

    w = conv.weight.detach().numpy()          # (Cout, Cin//g, K)
    b = conv.bias.detach().numpy()
    wj = jnp.asarray(np.transpose(w, (2, 1, 0)))  # (K, Cin//g, Cout)
    got = n(ops.conv1d(jnp.asarray(x).transpose(0, 2, 1), wj, jnp.asarray(b),
                       stride=stride, padding=pad, dilation=dilation,
                       groups=groups))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)

    if k == stride:
        got2 = n(ops.conv1d_strided_matmul(jnp.asarray(x).transpose(0, 2, 1),
                                           wj, jnp.asarray(b)))
        np.testing.assert_allclose(got2.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)


def test_fold_weight_norm():
    from torch.nn.utils.parametrizations import weight_norm
    conv = weight_norm(torch.nn.Conv1d(8, 16, 7, padding=3))
    w_folded = conv.weight.detach().numpy()
    g = conv.parametrizations.weight.original0.detach().numpy()
    v = conv.parametrizations.weight.original1.detach().numpy()
    got = n(ops.fold_weight_norm(jnp.asarray(g), jnp.asarray(v)))
    np.testing.assert_allclose(got, w_folded, rtol=1e-5, atol=1e-6)


class TestFSQ:
    LEVELS = [(7, 7, 7, 7, 7, 7), (9, 9, 9, 7, 7, 7)]

    @pytest.mark.parametrize("levels", LEVELS)
    def test_quantize_matches_reference(self, levels):
        from l3ac.vq.fsq import SuperFSQ
        m = SuperFSQ(levels=list(levels), noise_rate=0.5).eval()
        z = (RNG.standard_normal((4, 50, len(levels))) * 2).astype(np.float32)
        with torch.no_grad():
            q_ref, info = m(t(z))
        q, idx, li = ops.fsq.quantize(jnp.asarray(z), levels)
        np.testing.assert_allclose(n(q), q_ref.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(n(idx), info["indices"].numpy())
        np.testing.assert_array_equal(n(li), info["level_indices"].numpy().astype(np.int32))

    @pytest.mark.parametrize("levels", LEVELS)
    def test_decode_matches_reference(self, levels):
        from l3ac.vq.fsq import SuperFSQ
        m = SuperFSQ(levels=list(levels), noise_rate=0.0).eval()
        size = int(np.prod(levels))
        idx = RNG.integers(0, size, (3, 40)).astype(np.int32)
        ref = m.indices_to_codes(torch.tensor(idx)).numpy()
        got = n(ops.fsq.indices_to_codes(jnp.asarray(idx), levels))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("levels", LEVELS)
    def test_roundtrip(self, levels):
        z = (RNG.standard_normal((2, 30, len(levels))) * 3).astype(np.float32)
        q, idx, _ = ops.fsq.quantize(jnp.asarray(z), levels)
        codes = ops.fsq.indices_to_codes(idx, levels)
        np.testing.assert_allclose(n(codes), n(q), atol=1e-6)
        # re-encoding decoded codes reproduces identical indices
        _, idx2, _ = ops.fsq.quantize(codes * 10.0, levels)  # scale into saturation
        # (scaling is NOT identity-preserving; instead re-encode via arctanh domain)
        z2 = jnp.arctanh(jnp.clip(codes, -1 + 1e-6, 1 - 1e-6))
        _, idx3, _ = ops.fsq.quantize(z2, levels)
        np.testing.assert_array_equal(n(idx3), n(idx))

    def test_ste_gradient(self):
        import jax
        levels = (7, 7, 7)
        z = jnp.asarray(RNG.standard_normal((4, 3)).astype(np.float32))

        def loss(z):
            q, _, _ = ops.fsq.quantize_ste(z, levels)
            return jnp.sum(q ** 2)

        g = jax.grad(loss)(z)
        assert np.all(np.isfinite(n(g)))
        assert np.abs(n(g)).max() > 0  # STE passes gradients through


@pytest.mark.parametrize("K,Ci,Co,T", [(6, 24, 48, 600), (5, 48, 96, 500),
                                       (3, 96, 192, 300)])
def test_conv1d_strided_matmul_t_matches_natural(K, Ci, Co, T):
    """Transposed-layout strided downsample == the natural-layout form
    (encoder stage boundaries, reference l3ac/modules.py:97-100)."""
    from l3ac_tpu.ops.conv import conv1d_strided_matmul
    from l3ac_tpu.ops import transposed as tx
    rng = np.random.default_rng(K)
    x = jnp.asarray(rng.standard_normal((2, T, Ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, Ci, Co)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((Co,)).astype(np.float32))
    want = conv1d_strided_matmul(x, w, b)
    got = tx.conv1d_strided_matmul_t(x.transpose(0, 2, 1), w, b)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)
