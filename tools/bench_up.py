"""Isolate the decoder up-path cost (conv1x1 -> linear upsample -> ChannelNorm)
at each production stage geometry, to guide fusion work.

Times, per stage: the full chain, then each piece alone, on the real TPU with
the same scan-chained slope method as profile_decoder.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import functools


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
    # clamp at 0: sub-resolution stages can come out slightly negative
    return max(0.0, ((t2 - t1) - (t1 - t0)) / (k2 - k1))


def main():
    from l3ac_tpu.ops import conv1d, channel_norm, upsample_linear
    from l3ac_tpu.ops import transposed as tx

    B = 8
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    # (layout, T_in, C_in, C_out, stride) for the 1kbps decoder, 10 s batch 8
    stages = [
        ("ntc", 1776, 512, 256, 5),
        ("ntc", 8880, 256, 96, 3),
        ("nct", 26640, 96, 48, 3),
        ("nct", 79920, 48, 24, 2),
    ]
    for layout, T, Ci, Co, s in stages:
        kw, kb = jax.random.split(key)
        w = jax.random.normal(kw, (Ci, Co), dt) * 0.05
        b = jnp.zeros((Co,), dt)
        nw = jnp.ones((Co,), dt)
        nb = jnp.zeros((Co,), dt)
        if layout == "ntc":
            x = jax.random.normal(kb, (B, T, Ci), dt)
            conv = lambda h: conv1d(h, w.reshape(1, Ci, Co), b)
            ups = lambda h: upsample_linear(h, s)
            nrm = lambda h: channel_norm(h, nw, nb)
        else:
            x = jax.random.normal(kb, (B, Ci, T), dt)
            conv = lambda h: tx.conv1x1_t(h, w.reshape(1, Ci, Co), b)
            ups = lambda h: tx.upsample_linear_t(h, s)
            nrm = lambda h: tx.channel_norm_t(h, nw, nb)
        chain = lambda h: nrm(ups(conv(h)))
        t_chain = timeit(jax.jit(chain), x)
        t_conv = timeit(jax.jit(conv), x)
        z = jax.jit(conv)(x)
        t_ups = timeit(jax.jit(ups), z)
        u = jax.jit(ups)(z)
        t_nrm = timeit(jax.jit(nrm), u)
        # HBM-roofline floor for the fused op: read x, write out (bf16)
        bytes_min = (x.size + u.size) * 2
        floor_ms = bytes_min / 819e9 * 1e3
        print(f"{layout} T={T:6d} {Ci:3d}->{Co:3d} x{s}: "
              f"chain {t_chain*1e3:6.2f} ms  conv {t_conv*1e3:6.2f}  "
              f"ups {t_ups*1e3:6.2f}  norm {t_nrm*1e3:6.2f}  "
              f"roofline_floor {floor_ms:5.2f} ms")


if __name__ == "__main__":
    main()
