"""Torch test-oracle replica of the pinned ``local-attention==1.11.2`` semantics.

The reference model definition depends on this external pip package
(``/root/reference/pyproject.toml:12``, imported at ``l3ac/local_trans.py:23``);
it is not installed here, so this module re-implements the exact math of the
pinned version — windowed causal attention with one-window lookback, autopad,
dynamic position bias, GEGLU feed-forward — for cross-checking the JAX build.
State-dict key layout matches the real package (Sequential indices) so the
torch->JAX converter is exercised with realistic checkpoint keys.

Only the configuration the reference uses is supported:
causal=True, look_backward=1, look_forward=0, autopad=True, prenorm=True,
qk_rmsnorm=False, exact_windowsize=False, use_rotary_pos_emb=False (all four
released configs set en_coder_dynamic_pos=true).
"""

import math

import torch
import torch.nn.functional as F
from torch import nn

MASK_VALUE = -torch.finfo(torch.float32).max


class GEGLU(nn.Module):
    def forward(self, x):
        x, gate = x.chunk(2, dim=-1)
        return x * F.gelu(gate)


def FeedForward(dim, mult=4, dropout=0.0):
    inner_dim = int(dim * mult * 2 / 3)
    return nn.Sequential(
        nn.LayerNorm(dim),
        nn.Linear(dim, inner_dim * 2, bias=False),
        GEGLU(),
        nn.Dropout(dropout),
        nn.Linear(inner_dim, dim, bias=False),
    )


class DynamicPositionBias(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(1, dim),
            nn.SiLU(),
            nn.Linear(dim, dim),
            nn.SiLU(),
            nn.Linear(dim, heads),
        )

    def forward(self, i, j):
        assert j >= i
        rel_dist = torch.arange(j, dtype=torch.float)
        bias = self.mlp(rel_dist.unsqueeze(-1))                 # (j, heads)
        i_seq = torch.arange(j - i, j)
        j_seq = torch.arange(j)
        rel_dist_indices = (i_seq.unsqueeze(-1) - j_seq.unsqueeze(0)).abs()
        return bias[rel_dist_indices].permute(2, 0, 1)          # (heads, i, j)


def _rotate_half(x):
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    return torch.cat((-x2, x1), dim=-1)


def _rotary_freqs(n, dim):
    # SinusoidalEmbeddings (use_xpos=False) of local-attention 1.11.2:
    # inv_freq = 10000^{-2i/d}; freqs over positions 0..n-1, duplicated.
    inv = 1.0 / (10000 ** (torch.arange(0, dim, 2).float() / dim))
    t = torch.arange(n).float()
    fr = torch.einsum("i,j->ij", t, inv)
    return torch.cat((fr, fr), dim=-1)


def _apply_rotary(bq, bk, freqs):
    # apply_rotary_pos_emb with scale=1: q takes the last q_len rows.
    q_len = bq.shape[-2]
    qf = freqs[-q_len:]
    bq = bq * qf.cos() + _rotate_half(bq) * qf.sin()
    bk = bk * freqs.cos() + _rotate_half(bk) * freqs.sin()
    return bq, bk


def _look_around(x, backward=1, forward=0, pad_value=-1):
    # x: (b, w, n, ...) — concat shifted windows along the window-size dim.
    t = x.shape[1]
    pad_shape = list(x.shape)
    tensors = []
    padded = F.pad(x, (0, 0) * (x.ndim - 2) + (0, 0), value=0)  # placeholder
    # explicit pad along dim 1:
    pre = x.new_full((x.shape[0], backward, *x.shape[2:]), pad_value)
    post = x.new_full((x.shape[0], forward, *x.shape[2:]), pad_value)
    padded = torch.cat([pre, x, post], dim=1)
    for ind in range(forward + backward + 1):
        tensors.append(padded[:, ind:ind + t])
    return torch.cat(tensors, dim=2)


class LocalAttention(nn.Module):
    def __init__(self, window_size, causal=True, look_backward=1, look_forward=0,
                 dropout=0.0, dim=None, autopad=True, exact_windowsize=False,
                 scale=None, use_rotary_pos_emb=False, **kwargs):
        super().__init__()
        assert causal and look_backward == 1 and look_forward == 0 and autopad
        self.window_size = window_size
        self.exact_windowsize = exact_windowsize
        self.scale = scale
        self.dim = dim
        self.use_rotary_pos_emb = use_rotary_pos_emb

    def forward(self, q, k, v, mask=None, attn_bias=None):
        # q, k, v: (b, h, n, d)
        b, h, orig_n, d = q.shape
        q, k, v = map(lambda t: t.reshape(b * h, orig_n, d), (q, k, v))
        ws = self.window_size

        pad = (-orig_n) % ws
        if pad:
            q, k, v = map(lambda t: F.pad(t, (0, 0, 0, pad)), (q, k, v))
        n = q.shape[1]
        windows = n // ws

        scale = self.scale if self.scale is not None else d ** -0.5
        seq = torch.arange(n)
        b_t = seq.reshape(1, windows, ws)

        bq = q.reshape(b * h, windows, ws, d) * scale
        bk = k.reshape(b * h, windows, ws, d)
        bv = v.reshape(b * h, windows, ws, d)

        bk = _look_around(bk, pad_value=0.0)
        bv = _look_around(bv, pad_value=0.0)
        if self.use_rotary_pos_emb:
            # the real package evaluates rotary freqs on the looked-around
            # keys (window-relative positions 0..2ws-1), queries take the
            # last ws rows (local_attention/local_attention.py of 1.11.2)
            freqs = _rotary_freqs(bk.shape[-2], d)
            bq, bk = _apply_rotary(bq, bk, freqs)
        bq_t = b_t.unsqueeze(-1)                                  # (1, w, ws, 1)
        bq_k = _look_around(b_t.unsqueeze(-1), pad_value=-1).squeeze(-1)
        bq_k = bq_k.unsqueeze(-2)                                 # (1, w, 1, 2ws)
        pad_mask = bq_k == -1

        sim = torch.einsum("bwie,bwje->bwij", bq, bk)
        if attn_bias is not None:
            heads = attn_bias.shape[0]
            assert (b * h) % heads == 0
            attn_bias = attn_bias.repeat(b * h // heads, 1, 1).reshape(
                b * h, 1, *attn_bias.shape[1:])
            sim = sim + attn_bias

        causal_mask = bq_t < bq_k
        if self.exact_windowsize:
            causal_mask = causal_mask | (bq_t > (bq_k + ws))
        sim = sim.masked_fill(causal_mask, MASK_VALUE)
        sim = sim.masked_fill(pad_mask, MASK_VALUE)

        attn = sim.softmax(dim=-1)
        out = torch.einsum("bwij,bwje->bwie", attn, bv)
        out = out.reshape(b * h, n, d)[:, :orig_n]
        return out.reshape(b, h, orig_n, d)


class LocalMHA(nn.Module):
    def __init__(self, *, dim, window_size, dim_head=64, heads=8, dropout=0.0,
                 causal=False, prenorm=False, qk_rmsnorm=False, qk_scale=8,
                 use_xpos=False, xpos_scale_base=None, exact_windowsize=None,
                 use_rotary_pos_emb=True, **kwargs):
        super().__init__()
        assert prenorm and not qk_rmsnorm and not use_xpos and not use_rotary_pos_emb
        inner_dim = dim_head * heads
        self.heads = heads
        self.norm = nn.LayerNorm(dim)
        self.to_qkv = nn.Linear(dim, inner_dim * 3, bias=False)
        self.attn_fn = LocalAttention(
            window_size=window_size, causal=causal, autopad=True, scale=None,
            exact_windowsize=bool(exact_windowsize), dim=dim_head)
        self.to_out = nn.Linear(inner_dim, dim, bias=False)

    def forward(self, x, mask=None, attn_bias=None):
        x = self.norm(x)
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        b, n, _ = q.shape
        h = self.heads
        q, k, v = map(
            lambda t: t.reshape(b, n, h, -1).permute(0, 2, 1, 3), (q, k, v))
        out = self.attn_fn(q, k, v, mask=mask, attn_bias=attn_bias)
        out = out.permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(out)
