"""Per-stage timing inside the conv encoder on the real TPU.

Times the encoder's pieces (FirstBlock stem, per-stage ConvUnits, strided
downsampling convs, final units + projection) at the activation shapes the
full model produces, to guide kernel work — the encoder-side sibling of
tools/profile_decoder.py (reference call stack: l3ac/modules.py:71-116).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import functools

import jax.numpy as jnp

from l3ac_tpu.config import get_config
from l3ac_tpu.models import codec as fcodec
from l3ac_tpu.models.decoder import NARROW_MAX_C
from l3ac_tpu.models.layers import (residual_conv_unit_apply,
                                    residual_conv_unit_apply_t)
from l3ac_tpu.models.tconv import first_block_apply
from l3ac_tpu.ops import channel_norm, conv1d
from l3ac_tpu.ops import pallas as pk
from l3ac_tpu.ops import transposed as tx
from l3ac_tpu.ops.conv import conv1d_strided_matmul


def timeit(fn, x, k1=5, k2=45):
    """Two-point scan-chained slope timing (see profile_decoder.timeit)."""
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, iters):
        def step(c, _):
            out = fn(c)
            dep = (jnp.sum(out[..., :8].astype(jnp.float32)) * 1e-20
                   ).astype(c.dtype)
            return c + dep, ()
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    float(run(x, iters=k1)); float(run(x, iters=k2))
    t0 = time.perf_counter(); float(run(x, iters=k1)); t1 = time.perf_counter()
    float(run(x, iters=k2)); t2 = time.perf_counter()
    # clamp at 0: near-zero-cost stages land inside the two-point method's
    # noise floor and can come out slightly negative (ADVICE r3) — report
    # them as ~0 rather than as a self-contradictory negative time
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
    ep = params["encoder"]

    sr = cfg.sample_rate
    T = int(args.seconds * sr) // mc.hop_length * mc.hop_length
    x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T, 1), dtype) * .3

    total = 0.0
    if pk.enabled():
        stem = jax.jit(lambda x: pk.first_block.first_block_ct(x, ep["first"]))
        in_t = True
    else:
        stem = jax.jit(lambda x: first_block_apply(ep["first"], x))
        in_t = False
    dt = timeit(stem, x)
    total += dt
    h = stem(x)
    print(f"first_block     {dt*1e3:8.2f} ms   {x.shape} -> {h.shape}")

    for si, (stage, stride, i_d) in enumerate(zip(ep["stages"],
                                                  mc.compress_rates,
                                                  mc.encoder_dims[:-1])):
        narrow = i_d <= NARROW_MAX_C
        if narrow and not in_t:
            f = jax.jit(tx.to_t); dt = timeit(f, h); total += dt
            print(f"to_t            {dt*1e3:8.2f} ms   shape={h.shape}")
            h = f(h); in_t = True
        elif not narrow and in_t:
            f = jax.jit(tx.from_t); dt = timeit(f, h); total += dt
            print(f"from_t          {dt*1e3:8.2f} ms   shape={h.shape}")
            h = f(h); in_t = False

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
        dt = timeit(f, h); total += dt
        print(f"stage{si} units    {dt*1e3:8.2f} ms   shape={h.shape} "
              f"x{len(stage['units'])}")
        h = f(h)

        if in_t:
            def down_fn(h, stage=stage):
                y = tx.conv1d_strided_matmul_t(h, stage["down"]["w"],
                                               stage["down"]["b"])
                if "down_norm" in stage:
                    y = tx.channel_norm_t(y, stage["down_norm"]["w"],
                                          stage["down_norm"]["b"])
                return y
        else:
            def down_fn(h, stage=stage):
                y = conv1d_strided_matmul(h, stage["down"]["w"],
                                          stage["down"]["b"])
                if "down_norm" in stage:
                    y = channel_norm(y, stage["down_norm"]["w"],
                                     stage["down_norm"]["b"])
                return y
        f = jax.jit(down_fn)
        dt = timeit(f, h); total += dt
        h = f(h)
        print(f"stage{si} down x{stride:<2d} {dt*1e3:8.2f} ms   -> {h.shape}")

    if in_t:
        f = jax.jit(tx.from_t)
        dt = timeit(f, h); total += dt
        print(f"from_t          {dt*1e3:8.2f} ms   shape={h.shape}")
        h = f(h); in_t = False

    def last_fn(h):
        for unit in ep["last_units"]:
            h = residual_conv_unit_apply(unit, h)
        return conv1d(h, ep["out_conv"]["w"], ep["out_conv"]["b"], padding=1)
    f = jax.jit(last_fn)
    dt = timeit(f, h); total += dt
    h = f(h)
    print(f"last+proj       {dt*1e3:8.2f} ms   -> {h.shape}")
    print(f"sum             {total*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
