"""Per-stage timing + roofline breakdown on the real TPU: encoder / en_encoder
/ FSQ / en_decoder / decoder, plus the fused roundtrip. Each stage reports
measured time, RTF, XLA-counted FLOPs, MFU (vs bf16 peak) and achieved HBM
bandwidth — so the bottleneck and its roofline position are visible at a
glance. Guides kernel work.

Timing method: two-point scan-chained (see tools/profile_decoder.timeit) —
the axon relay elides repeated identical dispatches, block_until_ready does
not force remote completion, and one host readback costs ~30 ms, so each
measurement chains K dependent applications inside one jit and takes the
slope between two K values.
"""

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
from l3ac_tpu.models.quantizer import quantizer_apply


def timeit(fn, x, k1=5, k2=45):
    """Two-point scan-chained timing; fn maps one array to one array (or a
    tuple whose first element is an array)."""
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, iters):
        def step(c, _):
            out = fn(c)
            if isinstance(out, tuple):
                out = out[0]
            dep = (jnp.sum(out[..., :8].astype(jnp.float32)) * 1e-20
                   ).astype(c.dtype)
            return c + dep, ()
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    float(run(x, iters=k1)); float(run(x, iters=k2))
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
    params = fcodec.attach_bias_caches(params, mc)

    sr = cfg.sample_rate
    T = int(args.seconds * sr) // mc.hop_length * mc.hop_length
    audio = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T), dtype) * 0.3
    audio_sec = args.batch * T / sr

    feat = jax.jit(lambda a: fcodec.encoder_apply(params["encoder"],
                                                  a[..., None], mc))(audio)
    tf = jax.jit(lambda f: fcodec.en_encoder_apply(params["en_encoder"], f, mc))(feat)
    q = jax.jit(lambda f: quantizer_apply(params["quantizer"], f, mc.vq))(tf)[0]
    qf = jax.jit(lambda x: fcodec.en_decoder_apply(params["en_decoder"], x, mc))(q)

    from bench import _peak_flops

    def cost_of(fn, x):
        cost = jax.jit(fn).lower(x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if not cost:
            return 0.0, 0.0
        return float(cost.get("flops", 0.0)), float(cost.get(
            "bytes accessed", 0.0))

    peak = _peak_flops()
    stages = [
        ("encoder", lambda a: fcodec.encoder_apply(params["encoder"],
                                                   a[..., None], mc), audio),
        ("en_encoder", lambda f: fcodec.en_encoder_apply(params["en_encoder"],
                                                         f, mc), feat),
        ("quantizer", lambda f: quantizer_apply(params["quantizer"], f,
                                                mc.vq)[0], tf),
        ("en_decoder", lambda x: fcodec.en_decoder_apply(params["en_decoder"],
                                                         x, mc), q),
        ("decoder", lambda f: fcodec.decoder_apply(params["decoder"], f, mc), qf),
    ]
    print(f"{'stage':12s} {'ms':>8s} {'rtf':>9s} {'GFLOP':>8s} {'MFU%':>6s} "
          f"{'GB/s':>7s}")
    total = tot_flops = 0.0
    for name, fn, x in stages:
        dt = timeit(fn, x)
        fl, by = cost_of(fn, x)
        total += dt
        tot_flops += fl
        if dt <= 0:   # sub-resolution stage (two-point slope clamped to 0)
            print(f"{name:12s} {dt*1e3:8.2f} {'-':>9s} {fl/1e9:8.2f}")
            continue
        print(f"{name:12s} {dt*1e3:8.2f} {audio_sec/dt:9.1f} {fl/1e9:8.2f} "
              f"{100*fl/dt/peak:6.2f} {by/dt/1e9:7.1f}")
    print(f"{'sum':12s} {total*1e3:8.2f} {audio_sec/total:9.1f} "
          f"{tot_flops/1e9:8.2f} {100*tot_flops/total/peak:6.2f}")

    rt = lambda a: fcodec.decode(params, fcodec.encode(params, a, mc)[0],
                                 mc)[..., 0]
    dt = timeit(rt, audio)
    fl, by = cost_of(rt, audio)
    print(f"{'roundtrip':12s} {dt*1e3:8.2f} {audio_sec/dt:9.1f} {fl/1e9:8.2f} "
          f"{100*fl/dt/peak:6.2f} {by/dt/1e9:7.1f}")


if __name__ == "__main__":
    main()
