"""Per-piece timing inside the conv encoder on the real TPU (two-point
scan-chained; see tools/profile_decoder.timeit)."""

import argparse
import functools
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
from l3ac_tpu.models.decoder import NARROW_MAX_C
from l3ac_tpu.models.layers import (residual_conv_unit_apply,
                                    residual_conv_unit_apply_t)
from l3ac_tpu.ops import conv1d, channel_norm
from l3ac_tpu.ops import transposed as tx
from l3ac_tpu.ops.conv import conv1d_strided_matmul
from l3ac_tpu.ops import pallas as pk


def timeit(fn, x, k1=5, k2=45):
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
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1kbps")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    cfg = get_config(args.model)
    mc = cfg.network_config
    dtype = jnp.bfloat16
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=dtype)
    ep = params["encoder"]

    sr = cfg.sample_rate
    T = int(args.seconds * sr) // mc.hop_length * mc.hop_length
    x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T, 1), dtype) * 0.3

    total = 0.0

    def report(name, fn, x):
        nonlocal total
        dt = timeit(fn, x)
        total += dt
        print(f"{name:16s} {dt*1e3:8.2f} ms   in={tuple(x.shape)}")
        return jax.jit(fn)(x)

    h = report("first_block_ct", lambda a: pk.first_block.first_block_ct(a, ep["first"]), x)
    in_t = True
    for si, (stage, stride, i_d) in enumerate(zip(ep["stages"], mc.compress_rates,
                                                  mc.encoder_dims[:-1])):
        narrow = i_d <= NARROW_MAX_C
        if narrow and not in_t:
            h = report("to_t", tx.to_t, h)
            in_t = True
        elif not narrow and in_t:
            h = report("from_t", tx.from_t, h)
            in_t = False
        if in_t:
            def units(a, stage=stage):
                for u in stage["units"]:
                    a = residual_conv_unit_apply_t(u, a)
                return a
            h = report(f"stage{si} units_t", units, h)
            h = report(f"stage{si} from_t", tx.from_t, h)
            in_t = False
        else:
            def units(a, stage=stage):
                for u in stage["units"]:
                    a = residual_conv_unit_apply(u, a)
                return a
            h = report(f"stage{si} units", units, h)

        def down(a, stage=stage):
            a = conv1d_strided_matmul(a, stage["down"]["w"], stage["down"]["b"])
            if "down_norm" in stage:
                a = channel_norm(a, stage["down_norm"]["w"], stage["down_norm"]["b"])
            return a
        h = report(f"stage{si} down", down, h)

    def last(a):
        for u in ep["last_units"]:
            a = residual_conv_unit_apply(u, a)
        return conv1d(a, ep["out_conv"]["w"], ep["out_conv"]["b"], padding=1)
    h = report("last+out", last, h)
    print(f"{'sum':16s} {total*1e3:8.2f} ms   out={tuple(h.shape)}")

    dt = timeit(lambda a: fcodec.encoder_apply(ep, a, mc), x)
    print(f"{'full encoder':16s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
