"""Local-window transformer stack (the "en_encoder"/"en_decoder").

Re-implements the model semantics the reference gets from the pinned
``local-attention==1.11.2`` package plus the reference's wrappers
(``l3ac/local_trans.py``): per layer ``x = LocalMHA(x) + x; x = FF(x) + x`` with
a single shared DynamicPositionBias evaluated once per forward
(``l3ac/local_trans.py:42-48``), and the token down/up samplers DownTrans /
UpTransV2 and their Compressed enc/dec assemblies (``:114-186``).

Geometry from the reference builder (``l3ac/local_trans.py:50-53``):
dim_head = feature_dim // 4, heads = 6, ff inner = int(dim*4*2/3), causal, and
dynamic position bias (rotary is never used by released configs — all four set
en_coder_dynamic_pos = true).
"""

import dataclasses
import math
import os

import jax
import jax.numpy as jnp

from ..ops import attention, geglu, upsample_linear
from ..ops.pallas import local_attention as pallas_attention
from ..ops.conv import linear, linear_p, conv1d_strided_matmul
from ..ops.norms import layer_norm
from ..utils import init as pinit

HEADS = 6
FF_MULT = 4


@dataclasses.dataclass(frozen=True)
class TransConfig:
    dim: int
    depth: int
    window_size: int
    heads: int = HEADS
    dynamic_pos: bool = True

    @property
    def dim_head(self) -> int:
        return self.dim // 4

    @property
    def inner_dim(self) -> int:
        return self.dim_head * self.heads

    @property
    def ff_inner(self) -> int:
        return int(self.dim * FF_MULT * 2 / 3)


def init_local_trans(key, tc: TransConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 4 * tc.depth + 8))
    p = {"layers": []}
    if tc.dynamic_pos:
        # DynamicPositionBias MLP: Linear 1->d, SiLU, Linear d->d, SiLU,
        # Linear d->heads (all with bias), d = dim // 2
        d = tc.dim // 2
        l0 = pinit.torch_linear_params(next(keys), 1, d, dtype=dtype)
        l1 = pinit.torch_linear_params(next(keys), d, d, dtype=dtype)
        l2 = pinit.torch_linear_params(next(keys), d, tc.heads, dtype=dtype)
        p["dyn_bias"] = {"w0": l0["w"], "b0": l0["b"], "w1": l1["w"],
                         "b1": l1["b"], "w2": l2["w"], "b2": l2["b"]}
    for _ in range(tc.depth):
        attn = {
            "norm": pinit.norm_params(tc.dim, dtype),
            "qkv": pinit.torch_linear_params(next(keys), tc.dim,
                                             3 * tc.inner_dim, bias=False,
                                             dtype=dtype),
            "out": pinit.torch_linear_params(next(keys), tc.inner_dim, tc.dim,
                                             bias=False, dtype=dtype),
        }
        ff = {
            "norm": pinit.norm_params(tc.dim, dtype),
            "w1": pinit.torch_linear_params(next(keys), tc.dim, 2 * tc.ff_inner,
                                            bias=False, dtype=dtype),
            "w2": pinit.torch_linear_params(next(keys), tc.ff_inner, tc.dim,
                                            bias=False, dtype=dtype),
        }
        p["layers"].append({"attn": attn, "ff": ff})
    return p


def _mha_apply(p: dict, x: jnp.ndarray, tc: TransConfig,
               bias: jnp.ndarray | None) -> jnp.ndarray:
    """Pre-norm local MHA. x: (B, T, C), T already padded to a window multiple."""
    B, T, _ = x.shape
    h = layer_norm(x, p["norm"]["w"], p["norm"]["b"])
    qkv = linear_p(h, p["qkv"])                     # (B, T, 3*inner)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, tc.heads, tc.dim_head).transpose(0, 2, 1, 3)

    # fused Pallas kernel on TPU (measured 2.5x at window 250, 3.8x at window
    # 750 vs the jnp path — BENCH_NOTES.md round 3); jnp reference elsewhere,
    # when L3AC_TPU_NO_PALLAS is set, or on the rotary path (reference's
    # use_rotary_pos_emb — active only when dynamic position bias is off,
    # which no released config does; l3ac/local_trans.py:29)
    rotary = not tc.dynamic_pos
    from ..ops import pallas as pk
    use_pallas = pk.enabled() and not rotary
    if use_pallas:
        from ..parallel import sp
        qh, kh, vh = heads(q), heads(k), heads(v)
        if sp.active():
            # each shard's first window attends back into the left neighbor's
            # last KV window (one ppermute — the layer's entire cross-shard
            # communication; zeros + mask on the globally-first shard)
            n = tc.window_size
            pk0, _ = sp.halo_blocks(kh, n, 0, axis=2)
            pv0, _ = sp.halo_blocks(vh, n, 0, axis=2)
            out = pallas_attention.local_attention(
                qh, kh, vh, window_size=n, bias=bias,
                prev_k=pk0, prev_v=pv0, left_edge=sp.edge_flags()[0],
                interpret=pk.interpret_default())
        else:
            out = pallas_attention.local_attention(
                qh, kh, vh, window_size=tc.window_size, bias=bias,
                interpret=pk.interpret_default())
    else:
        out = attention.local_attention(
            heads(q), heads(k), heads(v), window_size=tc.window_size,
            bias=bias, rotary=rotary)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, tc.inner_dim)
    return linear_p(out, p["out"])


def _ff_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = layer_norm(x, p["norm"]["w"], p["norm"]["b"])
    h = geglu(linear_p(h, p["w1"]))
    return linear_p(h, p["w2"])


def attach_bias_cache(p: dict, tc: TransConfig) -> dict:
    """Return ``p`` with the DynamicPositionBias (heads, n, 2n) matrix
    precomputed into ``p["bias_cache"]``.

    The bias is a pure function of the (tiny) dyn_bias MLP weights and the
    window size, but its Toeplitz materialization costs ~3 ms per window-750
    stack on v5e (gather- and relayout-hostile shapes) — ~6 ms of the
    flagship step when rebuilt inside every jitted forward. Inference holds
    the weights fixed, so the zoo/serving/bench entry points attach this
    cache once at model build (``codec.attach_bias_caches``); training paths
    skip it and differentiate through the live MLP as before."""
    if tc.dynamic_pos and "dyn_bias" in p and "bias_cache" not in p:
        p = dict(p, bias_cache=attention.dynamic_position_bias(
            p["dyn_bias"], tc.window_size))
    return p


def local_trans_apply(p: dict, x: jnp.ndarray, tc: TransConfig) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T, C). Pads T to a window multiple internally
    (autopad) and crops back — safe under the causal mask."""
    B, T, C = x.shape
    pad = (-T) % tc.window_size
    if pad:
        from ..parallel import sp
        assert not sp.active(), (
            "under sequence parallelism the per-shard length must be a window "
            f"multiple (got T={T}, window={tc.window_size}) so the global "
            "window grid stays aligned across shards")
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    bias = None
    if tc.dynamic_pos:
        bias = p.get("bias_cache")
        if bias is None:
            bias = attention.dynamic_position_bias(p["dyn_bias"],
                                                   tc.window_size)
    for layer in p["layers"]:
        x = _mha_apply(layer["attn"], x, tc, bias) + x
        x = _ff_apply(layer["ff"], x) + x
    if pad:
        x = x[:, :T]
    return x


# ---------------------------------------------------------------------------
# Reference wrappers: plain enc/dec and compressed (down/up) enc/dec.
# All appliers below take and return (B, T, C) channels-last; the reference's
# (B, C, T) permutes are layout-only and vanish in our channels-last world.
# ---------------------------------------------------------------------------


def plain_encoder_config(mc) -> TransConfig:
    # reference: LocalEncoder(depth=1) (l3ac/en_codec.py:27-29)
    return TransConfig(dim=mc.feature_dim, depth=1,
                       window_size=mc.en_coder_window_size,
                       dynamic_pos=mc.en_coder_dynamic_pos)


def plain_decoder_config(mc) -> TransConfig:
    # reference: LocalDecoder(depth=en_coder_depth) (l3ac/en_codec.py:30-32)
    return TransConfig(dim=mc.feature_dim, depth=mc.en_coder_depth,
                       window_size=mc.en_coder_window_size,
                       dynamic_pos=mc.en_coder_dynamic_pos)


def compressed_encoder_configs(mc) -> dict:
    """reference: CompressedLocalEncoderWithCache(depth=3) — DownTrans(window=
    (win+cache)*rate, depth=3//2=1) then LocalTrans(window=win+cache, depth=2)
    (``l3ac/local_trans.py:145-165``, ``l3ac/en_codec.py:33-39``)."""
    depth = 3
    first = depth // 2
    win = mc.en_coder_window_size + mc.en_coder_cache_size
    rate = mc.en_coder_compress_rate
    return {
        "down": TransConfig(dim=mc.feature_dim, depth=first,
                            window_size=win * rate,
                            dynamic_pos=mc.en_coder_dynamic_pos),
        "post": TransConfig(dim=mc.feature_dim, depth=depth - first,
                            window_size=win,
                            dynamic_pos=mc.en_coder_dynamic_pos),
    }


def compressed_decoder_configs(mc) -> dict:
    """reference: CompressedLocalDecoderWithCache(depth=en_coder_depth) —
    LocalTrans(window=win, depth=depth-2) then UpTransV2(window=win*rate,
    depth=2) (``l3ac/local_trans.py:168-186``)."""
    win = mc.en_coder_window_size + mc.en_coder_cache_size
    rate = mc.en_coder_compress_rate
    return {
        "pre": TransConfig(dim=mc.feature_dim, depth=mc.en_coder_depth - 2,
                           window_size=win,
                           dynamic_pos=mc.en_coder_dynamic_pos),
        "up": TransConfig(dim=mc.feature_dim, depth=2, window_size=win * rate,
                          dynamic_pos=mc.en_coder_dynamic_pos),
    }


def init_compressed_encoder(key, mc, dtype=jnp.float32) -> dict:
    cfgs = compressed_encoder_configs(mc)
    k0, k1, k2 = jax.random.split(key, 3)
    rate = mc.en_coder_compress_rate
    return {
        "down_trans": init_local_trans(k0, cfgs["down"], dtype),
        # DownTrans v2: strided weight-normed Conv1d(k=rate, s=rate)
        # (l3ac/local_trans.py:138-142)
        "down_conv": pinit.conv_params(k1, rate, mc.feature_dim, mc.feature_dim,
                                       dtype=dtype),
        "post_trans": init_local_trans(k2, cfgs["post"], dtype),
    }


def compressed_encoder_apply(p: dict, x: jnp.ndarray, mc) -> jnp.ndarray:
    cfgs = compressed_encoder_configs(mc)
    x = local_trans_apply(p["down_trans"], x, cfgs["down"])
    x = conv1d_strided_matmul(x, p["down_conv"]["w"], p["down_conv"]["b"])
    return local_trans_apply(p["post_trans"], x, cfgs["post"])


def init_up_trans_v1(key, tc: TransConfig, rate: int, dtype=jnp.float32) -> dict:
    """UpTransV1 (reference ``l3ac/local_trans.py:97-111``): token upsampler
    that INTERLEAVES ``rate - 1`` learned tokens after every input token and
    runs a LocalTrans over the widened sequence. Dead code in the reference
    (no released config selects it — all use UpTransV2's linear upsample), but
    part of the component surface; implemented for 100% coverage.

    ``tc.window_size`` is the post-interleave window (the ctor's
    ``window_size``; the reference asserts it divisible by ``rate``)."""
    assert tc.window_size % rate == 0
    k0, k1 = jax.random.split(key)
    # torch.randn(1, 1, C) per learned token (std-normal init)
    tokens = jax.random.normal(k0, (rate - 1, tc.dim), dtype=dtype)
    return {"tokens": tokens, "trans": init_local_trans(k1, tc, dtype)}


def up_trans_v1_apply(p: dict, x: jnp.ndarray, tc: TransConfig,
                      rate: int) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T*rate, C). torch semantics: ``stack([x, tok_1, ...,
    tok_{rate-1}], dim=2).reshape(B, T*rate, C)`` — each input token is followed
    by the rate-1 learned tokens — then LocalTrans."""
    B, T, C = x.shape
    cols = [x] + [jnp.broadcast_to(p["tokens"][i].astype(x.dtype), x.shape)
                  for i in range(rate - 1)]
    h = jnp.stack(cols, axis=2).reshape(B, T * rate, C)
    return local_trans_apply(p["trans"], h, tc)


def init_compressed_decoder(key, mc, dtype=jnp.float32) -> dict:
    cfgs = compressed_decoder_configs(mc)
    k0, k1 = jax.random.split(key)
    return {
        "pre_trans": init_local_trans(k0, cfgs["pre"], dtype),
        "up_trans": init_local_trans(k1, cfgs["up"], dtype),
    }


def compressed_decoder_apply(p: dict, x: jnp.ndarray, mc) -> jnp.ndarray:
    cfgs = compressed_decoder_configs(mc)
    x = local_trans_apply(p["pre_trans"], x, cfgs["pre"])
    # UpTransV2: linear upsample x rate, then LocalTrans (l3ac/local_trans.py:114-126)
    x = upsample_linear(x, mc.en_coder_compress_rate)
    return local_trans_apply(p["up_trans"], x, cfgs["up"])
