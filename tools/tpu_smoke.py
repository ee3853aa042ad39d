"""On-TPU compile + numerics smoke over every Pallas kernel entry point.

Round 1 shipped a snapshot whose kernels passed CPU-interpret fp32 tests but
failed to compile on the real TPU (bf16 ``math.sin``; fp32 VMEM OOM at window
750). This tool closes that hole: it jits all kernel entry points *natively*
on the ambient accelerator in BOTH production dtypes at production shapes,
checks numerics against the pure-jnp references, and finishes with the full
1kbps encode+decode. Run it before committing kernel or model changes:

    python tools/tpu_smoke.py            # full sweep, exits nonzero on failure
    python tools/tpu_smoke.py --dtype bfloat16   # single dtype

Exercised entry points (l3ac_tpu/ops/pallas):
  conv_unit, conv_unit_t, conv_unit_ct (both layouts, wide + narrow C),
  first_block, first_block_ct, legacy_tail, legacy_tail_ct,
  local_attention (single-block window 250 AND row-tiled window 750),
  plus jit(encode) + jit(decode) end-to-end at 1kbps geometry.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RNG = np.random.default_rng(7)

# relative L2 error bounds. bf16: dominated by input/weight quantization
# (~2^-8/element). fp32: NOT exact on TPU — the MXU computes fp32 matmuls as
# bf16 multi-pass, and kernel vs XLA-reference pass counts differ (measured
# 4-6e-4 on the wide conv_unit); exact fp32 parity is owned by the CPU golden
# suite, this sweep owns compile coverage + gross numerics on hardware.
TOL = {jnp.float32: 1e-3, jnp.bfloat16: 4e-2}


def rel_l2(got, want) -> float:
    g = np.asarray(got, dtype=np.float64)
    w = np.asarray(want, dtype=np.float64)
    denom = np.linalg.norm(w) + 1e-12
    return float(np.linalg.norm(g - w) / denom)


class Runner:
    def __init__(self):
        self.failures: list[str] = []

    def check(self, name: str, got, want, tol: float):
        err = rel_l2(got, want)
        status = "ok" if err <= tol else "FAIL"
        print(f"  {name:<44s} rel_l2={err:.2e} (tol {tol:.0e}) {status}")
        if err > tol:
            self.failures.append(name)


def _rand(shape, dtype, scale=1.0):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32) * scale
                       ).astype(dtype)


def run_dtype(dtype, run: Runner):
    from l3ac_tpu.config import get_config
    from l3ac_tpu.models.layers import (init_conv_unit, conv_unit_apply,
                                        residual_legacy_unit_apply)
    from l3ac_tpu.models.tconv import init_first_block, first_block_apply
    from l3ac_tpu.models.decoder import init_decoder
    from l3ac_tpu.ops import attention as ref_attn
    from l3ac_tpu.ops import conv1d, snake
    from l3ac_tpu.ops.pallas import (conv_unit as pk_cu, first_block as pk_fb,
                                     legacy_tail as pk_lt,
                                     local_attention as pk_la)

    tol = TOL[dtype]
    name = jnp.dtype(dtype).name
    print(f"[{name}]")

    def cast(tree):
        return jax.tree.map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
            else a, tree)

    # --- conv_unit, natural layout, wide C (encoder final stage geometry)
    p32 = init_conv_unit(jax.random.PRNGKey(0), 192, snake_act=True,
                         use_norm=True)
    x32 = _rand((4, 600, 192), jnp.float32)
    want = x32 + conv_unit_apply(p32, x32)
    got = pk_cu.conv_unit(x32.astype(dtype), cast(p32))
    run.check("conv_unit (B4,T600,C192)", got, want, tol)

    # --- conv_unit_t / conv_unit_ct, transposed layout, narrow C (decoder)
    p32 = init_conv_unit(jax.random.PRNGKey(1), 24, snake_act=True,
                         use_norm=True)
    x32 = _rand((2, 4000, 24), jnp.float32)
    want = x32 + conv_unit_apply(p32, x32)
    got = pk_cu.conv_unit_t(x32.astype(dtype), cast(p32))
    run.check("conv_unit_t (B2,T4000,C24)", got, want, tol)
    got = pk_cu.conv_unit_ct(x32.astype(dtype).transpose(0, 2, 1), cast(p32))
    run.check("conv_unit_ct (B2,C24,T4000)", got.transpose(0, 2, 1), want, tol)

    # --- first_block / first_block_ct (encoder stem at raw audio rate)
    p32 = init_first_block(jax.random.PRNGKey(2), 24)
    x32 = _rand((2, 8000, 1), jnp.float32)
    want = first_block_apply(p32, x32)
    got = pk_fb.first_block(x32.astype(dtype), cast(p32))
    run.check("first_block (B2,T8000)", got, want, tol)
    got = pk_fb.first_block_ct(x32.astype(dtype), cast(p32))
    run.check("first_block_ct (B2,T8000)", got.transpose(0, 2, 1), want, tol)

    # --- legacy_tail / legacy_tail_ct (decoder tail at audio rate)
    mc_dbg = get_config("debug").network_config
    pdec32 = init_decoder(jax.random.PRNGKey(3), mc_dbg)
    C = mc_dbg.decoder_dims[-1]
    x32 = _rand((2, 8000, C), jnp.float32, scale=0.5)
    h = x32
    for u, d in zip(pdec32["tail_units"], (1, 3, 9)):
        h = residual_legacy_unit_apply(u, h, dilation=d)
    want = jnp.tanh(conv1d(snake(h, pdec32["tail_alpha"]),
                           pdec32["out_conv"]["w"], pdec32["out_conv"]["b"],
                           padding=3))
    pdec = cast(pdec32)
    got = pk_lt.legacy_tail(x32.astype(dtype), pdec["tail_units"],
                            pdec["tail_alpha"], pdec["out_conv"])
    run.check("legacy_tail (B2,T8000,C24)", got, want, tol)
    got = pk_lt.legacy_tail_ct(x32.astype(dtype).transpose(0, 2, 1),
                               pdec["tail_units"], pdec["tail_alpha"],
                               pdec["out_conv"])
    run.check("legacy_tail_ct (B2,C24,T8000)", got, want, tol)
    xt = x32.astype(dtype).transpose(0, 2, 1)
    got = pk_lt.legacy_tail_poly_ct(xt[:, :, 0::2], xt[:, :, 1::2],
                                    pdec["tail_units"], pdec["tail_alpha"],
                                    pdec["out_conv"])
    run.check("legacy_tail_poly_ct (B2,C24,Tt4000)", got, want, tol)

    # --- local_attention: single-block (w=250) AND row-tiled (w=750) paths,
    # the 1kbps production windows (H=6, D=32)
    for n, T in ((250, 1000), (750, 3000)):
        q32 = _rand((1, 6, T, 32), jnp.float32)
        k32 = _rand((1, 6, T, 32), jnp.float32)
        v32 = _rand((1, 6, T, 32), jnp.float32)
        b32 = _rand((6, n, 2 * n), jnp.float32)
        want = ref_attn.local_attention(q32, k32, v32, window_size=n,
                                        bias=b32)
        got = pk_la.local_attention(q32.astype(dtype), k32.astype(dtype),
                                    v32.astype(dtype), window_size=n,
                                    bias=b32)
        run.check(f"local_attention (w={n}, T={T})", got, want, tol)

    # --- up_fused / up_fused_ct (decoder stage up paths at 1kbps production
    # geometry: wide natural-layout stage0 x5 and narrow transposed stage3 x2)
    from l3ac_tpu.ops import channel_norm, upsample_linear
    from l3ac_tpu.ops import transposed as tx
    from l3ac_tpu.ops.pallas import upsample as pk_up
    x32 = _rand((2, 1776, 512), jnp.float32, scale=0.5)
    w32 = _rand((1, 512, 256), jnp.float32, scale=0.05)
    b32 = _rand((256,), jnp.float32, scale=0.1)
    nw32 = _rand((256,), jnp.float32, scale=0.3) + 1.0
    nb32 = _rand((256,), jnp.float32, scale=0.1)
    want = channel_norm(upsample_linear(conv1d(x32, w32, b32), 5), nw32, nb32)
    got = pk_up.up_fused(x32.astype(dtype), w32.astype(dtype),
                         b32.astype(dtype), nw32.astype(dtype),
                         nb32.astype(dtype), scale=5)
    run.check("up_fused (B2,T1776,512->256,x5)", got, want, tol)
    x32 = _rand((2, 48, 20000), jnp.float32, scale=0.5)
    w32 = _rand((1, 48, 24), jnp.float32, scale=0.1)
    b32 = _rand((24,), jnp.float32, scale=0.1)
    nw32 = _rand((24,), jnp.float32, scale=0.3) + 1.0
    nb32 = _rand((24,), jnp.float32, scale=0.1)
    want = tx.channel_norm_t(tx.upsample_linear_t(
        tx.conv1x1_t(x32, w32, b32), 2), nw32, nb32)
    got = pk_up.up_fused_ct(x32.astype(dtype), w32.astype(dtype),
                            b32.astype(dtype), nw32.astype(dtype),
                            nb32.astype(dtype), scale=2)
    run.check("up_fused_ct (B2,C48->24,T20000,x2)", got, want, tol)

    # --- int8 fused dequant-matmul (pw1 geometry of the decoder's wide stage)
    from l3ac_tpu.ops import quantized
    from l3ac_tpu.ops.pallas import int8_matmul as pk_q
    w32 = _rand((512, 2048), jnp.float32, scale=0.05)
    x32 = _rand((2, 600, 512), jnp.float32)
    w_q, scale = quantized.quantize_weight(w32)
    want = x32 @ quantized.dequantize_weight(w_q, scale, jnp.float32)
    got = pk_q.int8_matmul(x32.astype(dtype), w_q, scale)
    run.check("int8_matmul (M1200,K512,N2048)", got, want, tol)
    # unaligned N (ADVICE r2): the production qkv geometry N=576 is NOT a lane
    # multiple; a Mosaic tiling failure here must surface in smoke, not at
    # inference time
    w32 = _rand((128, 576), jnp.float32, scale=0.05)
    x32 = _rand((2, 500, 128), jnp.float32)
    w_q, scale = quantized.quantize_weight(w32)
    want = x32 @ quantized.dequantize_weight(w_q, scale, jnp.float32)
    got = pk_q.int8_matmul(x32.astype(dtype), w_q, scale)
    run.check("int8_matmul unaligned (M1000,K128,N576)", got, want, tol)

    # --- full model: jit(encode) + jit(decode), 1kbps geometry
    from l3ac_tpu.models import codec as fcodec
    cfg = get_config("1kbps")
    mc = cfg.network_config
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=dtype)
    T = 2 * cfg.sample_rate // mc.hop_length * mc.hop_length
    audio = _rand((2, T), dtype, scale=0.3)
    qf, idx = jax.jit(lambda p, a: fcodec.encode(p, a, mc))(params, audio)
    out = jax.jit(lambda p, q: fcodec.decode(p, q, mc))(params, qf)
    ok = (np.isfinite(np.asarray(out, dtype=np.float32)).all()
          and out.shape == (2, T))
    print(f"  {'encode+decode 1kbps e2e':<44s} "
          f"out={out.shape} finite={bool(ok)} {'ok' if ok else 'FAIL'}")
    if not ok:
        run.failures.append(f"e2e[{name}]")

    # --- SP kernel path under shard_map: encode_sp/decode_sp compile + run
    # with the kernels' halo-operand code paths (lh/rh operands, SMEM bounds,
    # kp0/vp0 + stacked bias) on the real device. With one chip the mesh is
    # sp=n_devices (>=1); degenerate ppermute still exercises the kernel-side
    # SP plumbing Mosaic must legalize.
    from jax.sharding import Mesh
    from l3ac_tpu.parallel.mesh import AXES
    devs = np.asarray(jax.devices())
    n_sp = devs.size
    mesh = Mesh(devs.reshape(1, n_sp, 1), AXES)
    T_sp = fcodec.sp_time_quantum(mc) * n_sp
    a_sp = _rand((1, T_sp), dtype, scale=0.3)
    q_sp, idx_sp = jax.jit(
        lambda p, x: fcodec.encode_sp(p, x, mc, mesh))(params, a_sp)
    y_sp = jax.jit(lambda p, x: fcodec.decode_sp(p, x, mc, mesh))(params, q_sp)
    ok = np.isfinite(np.asarray(y_sp, dtype=np.float32)).all()
    if n_sp == 1:
        # sp=1 must agree with the monolithic path bit-for-bit on indices
        qf1, idx1 = jax.jit(
            lambda p, x: fcodec.encode(p, x, mc))(params, a_sp)
        ok = ok and bool((np.asarray(idx_sp) == np.asarray(idx1)).all())
    print(f"  {'encode_sp+decode_sp shard_map kernels':<44s} "
          f"sp={n_sp} finite+idx={bool(ok)} {'ok' if ok else 'FAIL'}")
    if not ok:
        run.failures.append(f"sp_kernels[{name}]")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="both",
                    choices=["both", "float32", "bfloat16"])
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    dtypes = {"both": [jnp.bfloat16, jnp.float32],
              "float32": [jnp.float32],
              "bfloat16": [jnp.bfloat16]}[args.dtype]

    run = Runner()
    for dt in dtypes:
        run_dtype(dt, run)
    if run.failures:
        print(f"SMOKE FAILED: {run.failures}")
        sys.exit(1)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
