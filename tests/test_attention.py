"""Local windowed attention: parity vs the torch oracle + independent
dense-attention equivalence property."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from l3ac_tpu.models import local_transformer as lt
from l3ac_tpu.ops import attention
from l3ac_tpu.runtime import convert
from tests.oracle import local_attention_oracle as oracle

RNG = np.random.default_rng(7)


def test_dense_equivalence():
    """Windowed attention must equal dense attention under the equivalent mask:
    query t attends keys s with s <= t and s >= window_start(t) - window."""
    B, H, T, D, n = 2, 3, 48, 8, 12
    q = RNG.standard_normal((B, H, T, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, T, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, T, D)).astype(np.float32)

    got = attention.local_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), window_size=n)

    # dense reference with explicit mask
    scale = D ** -0.5
    sim = np.einsum("bhtd,bhsd->bhts", q * scale, k)
    t_idx = np.arange(T)[:, None]
    s_idx = np.arange(T)[None, :]
    win_start = (t_idx // n) * n
    mask = (s_idx <= t_idx) & (s_idx >= win_start - n)
    sim = np.where(mask, sim, -1e30)
    attn = np.exp(sim - sim.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    want = np.einsum("bhts,bhsd->bhtd", attn, v)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_dynamic_position_bias_parity():
    torch.manual_seed(0)
    ref = oracle.DynamicPositionBias(dim=16, heads=6)
    n = 10
    want = ref(n, 2 * n).detach().numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = {}
    for i, seq in enumerate((0, 2, 4)):
        lin = convert._linear(sd, f"mlp.{seq}")
        p[f"w{i}"] = jnp.asarray(lin["w"])
        p[f"b{i}"] = jnp.asarray(lin["b"])
    got = attention.dynamic_position_bias(p, n)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T", [96, 100])  # multiple and non-multiple of window
def test_local_trans_parity_vs_oracle(T):
    """Full LocalTrans stack (depth 2, dynamic pos bias) vs the torch oracle,
    through the state-dict converter."""
    from tests.oracle import import_reference
    import_reference()  # makes the torch reference importable standalone
    from l3ac.local_trans import LocalTrans  # reference wrapper, oracle backend

    dim, depth, window = 32, 2, 16
    torch.manual_seed(5)
    ref = LocalTrans(dim=dim, depth=depth, causal=True,
                     local_attn_window_size=window, dim_head=dim // 4, heads=6,
                     ff_mult=4, use_dynamic_pos_bias=True).eval()

    x = RNG.standard_normal((2, T, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = convert._local_trans(sd, "", depth)
    p = jax.tree.map(jnp.asarray, p)
    tc = lt.TransConfig(dim=dim, depth=depth, window_size=window, dynamic_pos=True)
    got = lt.local_trans_apply(p, jnp.asarray(x), tc)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("T", [48, 50])
def test_rotary_parity_vs_oracle(T):
    """Rotary path (reference's use_rotary_pos_emb, active when dynamic pos
    bias is off — dead in released configs but part of the model surface) vs
    the torch oracle's replica of local-attention 1.11.2 rotary."""
    B, H, D, n = 2, 3, 8, 12
    q = RNG.standard_normal((B, H, T, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, T, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, T, D)).astype(np.float32)

    ref = oracle.LocalAttention(window_size=n, causal=True, autopad=True,
                                dim=D, use_rotary_pos_emb=True)
    with torch.no_grad():
        want = ref(torch.tensor(q), torch.tensor(k), torch.tensor(v)).numpy()

    pad = (-T) % n
    qj, kj, vj = (jnp.pad(jnp.asarray(a), ((0, 0), (0, 0), (0, pad), (0, 0)))
                  for a in (q, k, v))
    got = attention.local_attention(qj, kj, vj, window_size=n, rotary=True)
    np.testing.assert_allclose(np.asarray(got)[:, :, :T], want,
                               rtol=1e-4, atol=1e-5)


def test_causality():
    """Changing future inputs must not affect past outputs."""
    dim, depth, window = 32, 2, 16
    tc = lt.TransConfig(dim=dim, depth=depth, window_size=window, dynamic_pos=True)
    p = lt.init_local_trans(jax.random.PRNGKey(0), tc)

    x = jnp.asarray(RNG.standard_normal((1, 64, dim)).astype(np.float32))
    y1 = lt.local_trans_apply(p, x, tc)
    x2 = x.at[:, 40:].set(999.0)
    y2 = lt.local_trans_apply(p, x2, tc)
    np.testing.assert_allclose(np.asarray(y1[:, :40]), np.asarray(y2[:, :40]),
                               rtol=1e-5, atol=1e-5)
