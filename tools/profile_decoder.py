"""Per-stage timing inside the conv decoder on the real TPU.

Times each decoder stage's pieces (ConvUnits / EnhanceBlock / upsample path /
tail) at the activation shapes the full model produces, to guide kernel work.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from l3ac_tpu.config import get_config
from l3ac_tpu.models import codec as fcodec
from l3ac_tpu.models import decoder as fdec
from l3ac_tpu.models.layers import (residual_conv_unit_apply,
                                    residual_conv_unit_apply_t)
from l3ac_tpu.models.tconv import enhance_block_apply, enhance_block_apply_t
from l3ac_tpu.ops import conv1d, channel_norm, upsample_linear
from l3ac_tpu.ops import transposed as tx


def timeit(fn, x, k1=5, k2=45):
    """Two-point scan-chained timing.

    The axon relay elides repeated identical dispatches, block_until_ready
    does not force remote completion, and a host readback carries a ~30 ms
    fixed sync cost. So: chain K applications inside ONE jit (each iteration
    depends on the previous), read back a scalar, do it for two K values, and
    take the slope — the fixed sync cancels exactly.
    """
    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, iters):
        def step(c, _):
            out = fn(c)
            dep = (jnp.sum(out[..., :8].astype(jnp.float32)) * 1e-20
                   ).astype(c.dtype)
            return c + dep, ()
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    float(run(x, iters=k1)); float(run(x, iters=k2))  # compile + warm
    t0 = time.perf_counter(); float(run(x, iters=k1)); t1 = time.perf_counter()
    float(run(x, iters=k2)); t2 = time.perf_counter()
    # clamp at 0: sub-resolution stages can come out slightly negative
    return max(0.0, ((t2 - t1) - (t1 - t0)) / (k2 - k1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1kbps")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    cfg = get_config(args.model)
    mc = cfg.network_config
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=dtype)
    dp = params["decoder"]

    sr = cfg.sample_rate
    T = int(args.seconds * sr) // mc.hop_length * mc.hop_length
    n_tok = T // (mc.hop_length // mc.en_coder_compress_rate) \
        if mc.en_coder_compress_rate else T // mc.hop_length
    # decoder input length = audio_T / conv_hop
    conv_hop = 1
    for r in mc.decode_rates:
        conv_hop *= r
    t_in = T // conv_hop
    key = jax.random.PRNGKey(1)

    x = jax.random.normal(key, (args.batch, t_in, mc.feature_dim), dtype)

    head = jax.jit(lambda x: conv1d(x, dp["in_conv"]["w"], dp["in_conv"]["b"],
                                    padding=1))
    dt = timeit(head, x)
    print(f"head conv       {dt*1e3:8.2f} ms   shape={x.shape}")
    h = head(x)

    total = dt
    in_t = False
    for si, (stage, stride, i_d) in enumerate(zip(dp["stages"], mc.decode_rates,
                                                  mc.decoder_dims[:-1])):
        if not in_t and i_d <= fdec.NARROW_MAX_C:
            f = jax.jit(tx.to_t)
            dt = timeit(f, h)
            total += dt
            print(f"to_t            {dt*1e3:8.2f} ms   shape={h.shape}")
            h = f(h)
            in_t = True

        if in_t:
            def units_fn(h, stage=stage):
                for unit in stage["units"]:
                    h = residual_conv_unit_apply_t(unit, h)
                return h
        else:
            def units_fn(h, stage=stage):
                for unit in stage["units"]:
                    h = residual_conv_unit_apply(unit, h)
                return h
        f = jax.jit(units_fn)
        dt = timeit(f, h)
        total += dt
        print(f"stage{si} units    {dt*1e3:8.2f} ms   shape={h.shape} "
              f"x{len(stage['units'])}")
        h = f(h)

        eb = enhance_block_apply_t if in_t else enhance_block_apply
        f = jax.jit(lambda h, stage=stage, eb=eb: eb(stage["enhance"], h))
        dt = timeit(f, h)
        total += dt
        print(f"stage{si} enhance  {dt*1e3:8.2f} ms")
        h = f(h)

        from l3ac_tpu.ops import pallas as pk
        last = si == len(dp["stages"]) - 1
        # production route: the last stage hands the tail its PHASE-SPLIT
        # outputs (no interleave); time the up+tail pair as one unit there
        poly = (last and pk.enabled() and in_t and stride == 2
                and mc.decoder_last_layer == "legacy")
        if poly:
            def up_tail_fn(h, stage=stage, stride=stride):
                x0, x1 = fdec._up_path(stage, h, stride, in_t=True,
                                       phase_split=True)
                return pk.legacy_tail.legacy_tail_poly_ct(
                    x0, x1, dp["tail_units"], dp["tail_alpha"],
                    dp["out_conv"])
            f = jax.jit(up_tail_fn)
            dt = timeit(f, h)
            total += dt
            print(f"stage{si} up+tail (poly) {dt*1e3:8.2f} ms   "
                  f"(phase-split x{stride} + fused tail)")
            h = f(h)
            break
        def up_fn(h, stage=stage, stride=stride, in_t=in_t):
            return fdec._up_path(stage, h, stride, in_t=in_t)
        f = jax.jit(up_fn)
        dt = timeit(f, h)
        total += dt
        print(f"stage{si} up       {dt*1e3:8.2f} ms   -> x{stride}")
        h = f(h)
    else:
        def tail_fn(h):
            from l3ac_tpu.ops import pallas as pk
            if pk.enabled():
                return pk.legacy_tail.legacy_tail_ct(
                    h, dp["tail_units"], dp["tail_alpha"], dp["out_conv"])
            return h
        f = jax.jit(tail_fn)
        dt = timeit(f, h)
        total += dt
        print(f"tail            {dt*1e3:8.2f} ms   shape={h.shape}")
    print(f"sum             {total*1e3:8.2f} ms")

    full = jax.jit(lambda x: fdec.decoder_apply(dp, x, mc))
    dt = timeit(full, x)
    print(f"full decoder    {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
