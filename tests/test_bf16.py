"""bf16 numerics: production inference dtype vs the fp32 golden path.

VERDICT r1 missing #7: production runs bf16 (bench.py default) but nothing
bounded bf16-vs-fp32 behavior. These tests pin down what IS guaranteed and
what is only statistical:

- FSQ itself is fp32-forced (ops/fsq.py) -> given identical latents, indices
  are bit-exact whatever the ambient dtype. Hard guarantee, tested exactly.
- Through a bf16 en_encoder the latents themselves carry ~2^-8 relative noise,
  so tokens whose tanh-squashed value lands within that distance of a rounding
  boundary CAN flip (reference semantics have the same property between any
  two float precisions). At random init the agreement is statistical; the
  VERDICT r4 red-suite post-mortem measured the per-draw distribution on an
  8-seed sweep per geometry (seeds 1000..1007, CPU backend):
      0k75bps  min 0.940  mean 0.961
      1kbps    min 0.935  mean 0.961
      1k5bps   min 0.915  mean 0.961
      3kbps    min 0.935  mean 0.948   (9^3*7^3 levels: finer FSQ cells ->
                                        more bf16 boundary flips than 7^6)
  A flat per-draw >= 0.95 threshold is therefore seed-marginal for EVERY
  geometry. The tests below (a) give each test its OWN fixed rng so the
  audio no longer depends on suite order, (b) average agreement over 4 fixed
  draws (mean-of-4 ~= 0.947-0.965 measured), and (c) assert per-geometry
  thresholds >= 0.02 below the measured mean-of-4. With trained (saturated)
  weights agreement is expected higher — re-verify when real checkpoints are
  available (README "real-checkpoint acceptance").
- Decoding the SAME indices in bf16 vs fp32: relative L2 bounded (~0.12 at
  random init — the untrained norm-heavy decoder re-amplifies quantization
  noise at every ChannelNorm; trained scales are tamer).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l3ac_tpu.config import get_config
from l3ac_tpu.models import codec as fcodec
from l3ac_tpu.ops import fsq

# Calibrated floors for mean-of-4 agreement (draw seeds 1000..1003); measured
# means 0.9625 / 0.9625 / 0.965 / 0.9475 — margin >= 0.02 absorbs backend
# rounding differences (CPU vs TPU fusion changes which latents sit on FSQ
# boundaries).
AGREEMENT_FLOOR = {"debug": 0.93, "0k75bps": 0.93, "1kbps": 0.93,
                   "1k5bps": 0.93, "3kbps": 0.92}
DRAW_SEEDS = (1000, 1001, 1002, 1003)


def _rel_l2(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def _bf16(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tree)


def _audio(seed: int, shape) -> jnp.ndarray:
    """Fixed per-test audio: depends only on the seed, never on suite order."""
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal(shape) * 0.3).astype(np.float32))


def _mean_agreement(mc, p32, pbf, batch, T, seeds=DRAW_SEEDS) -> float:
    enc = jax.jit(lambda p, a: fcodec.encode(p, a, mc))
    vals = []
    for seed in seeds:
        audio = _audio(seed, (batch, T))
        _, i32 = enc(p32, audio)
        _, ibf = enc(pbf, audio.astype(jnp.bfloat16))
        vals.append(float(np.mean(np.asarray(i32) == np.asarray(ibf))))
    return float(np.mean(vals))


def test_fsq_indices_bitexact_across_dtypes():
    """fp32-forced FSQ: identical latents give identical indices regardless of
    the ambient dtype the latents arrive in (bf16 in == fp32-of-that-bf16 in)."""
    rng = np.random.default_rng(11)
    z32 = jnp.asarray(rng.standard_normal((4, 100, 6)).astype(np.float32))
    zbf = z32.astype(jnp.bfloat16)
    levels = (7, 7, 7, 7, 7, 7)
    _, idx_bf, _ = fsq.quantize(zbf, levels)
    _, idx_32, _ = fsq.quantize(zbf.astype(jnp.float32), levels)
    np.testing.assert_array_equal(np.asarray(idx_bf), np.asarray(idx_32))
    # roundtrip stays exact in bf16 ambient: decode -> re-encode same indices
    codes = fsq.indices_to_codes(idx_bf, levels, dtype=jnp.bfloat16)
    # codes are exact level grid points; re-quantizing them reproduces indices
    _, idx_rt, _ = fsq.quantize(jnp.arctanh(codes.astype(jnp.float32)
                                            * 0.999999), levels)
    # (arctanh of the grid point maps back into the same rounding bin)
    np.testing.assert_array_equal(np.asarray(idx_rt), np.asarray(idx_bf))


@pytest.mark.parametrize("name", ["debug"])
def test_bf16_end_to_end_index_stability(name):
    cfg = get_config(name)
    mc = cfg.network_config
    p32 = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=jnp.float32)
    pbf = _bf16(p32)
    agreement = _mean_agreement(mc, p32, pbf, 2, mc.hop_length * 200)
    assert agreement >= AGREEMENT_FLOOR[name], agreement


@pytest.mark.slow
@pytest.mark.parametrize("name", ["0k75bps", "1kbps", "1k5bps", "3kbps"])
def test_bf16_released_geometry_index_stability_and_decode(name):
    """bf16 behavior at every RELEASED geometry (VERDICT r2 item 7 / r3 item
    4), not just the debug toy: mean-of-4-fixed-draws index agreement above
    the calibrated per-geometry floor at random init (trained saturated
    weights are expected higher; the TPU-measured number is pinned in
    BENCH_NOTES so drift across rounds is visible) and same-index decode
    error bounded."""
    cfg = get_config(name)
    mc = cfg.network_config
    p32 = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=jnp.float32)
    pbf = _bf16(p32)
    T = mc.hop_length * 200                      # ~3.4 s
    agreement = _mean_agreement(mc, p32, pbf, 1, T)
    assert agreement >= AGREEMENT_FLOOR[name], (name, agreement)

    audio = _audio(DRAW_SEEDS[0], (1, T))
    _, i32 = jax.jit(lambda p, a: fcodec.encode(p, a, mc))(p32, audio)
    y32 = jax.jit(lambda p, i: fcodec.decode_indices(p, i, mc))(p32, i32)
    ybf = jax.jit(lambda p, i: fcodec.decode_indices(p, i, mc))(pbf, i32)
    assert _rel_l2(ybf, y32) <= 0.25, _rel_l2(ybf, y32)


@pytest.mark.parametrize("name", ["debug"])
def test_bf16_same_index_decode_error_bounded(name):
    cfg = get_config(name)
    mc = cfg.network_config
    p32 = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=jnp.float32)
    pbf = _bf16(p32)
    audio = _audio(42, (2, mc.hop_length * 200))
    _, i32 = jax.jit(lambda p, a: fcodec.encode(p, a, mc))(p32, audio)

    y32 = jax.jit(lambda p, i: fcodec.decode_indices(p, i, mc))(p32, i32)
    ybf = jax.jit(lambda p, i: fcodec.decode_indices(p, i, mc))(pbf, i32)
    assert _rel_l2(ybf, y32) <= 0.25, _rel_l2(ybf, y32)
