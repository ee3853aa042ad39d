"""Microbench: fused Pallas ConvUnit vs plain-XLA path, per decoder stage shape.

Two-point scan-chained timing (see tools/profile_decoder.timeit for why).
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from l3ac_tpu.models.layers import (init_conv_unit, conv_unit_apply,
                                    conv_unit_apply_t)
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
    # clamp at 0: sub-resolution stages can come out slightly negative
    return max(0.0, ((t2 - t1) - (t1 - t0)) / (k2 - k1))


SHAPES = [  # (B, T, C) decoder stages at 10 s batch 8, 1kbps
    (8, 1776, 512),
    (8, 8880, 256),
    (8, 26640, 96),
    (8, 79920, 48),
    (8, 159840, 24),
]


def main():
    dtype = jnp.bfloat16
    for B, T, C in SHAPES:
        p = init_conv_unit(jax.random.PRNGKey(0), C, snake_act=True,
                           use_norm=True, dtype=dtype)
        flops = 16 * B * T * C * C  # two pointwise matmuls

        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C), dtype)
        t_ref = timeit(lambda x: x + conv_unit_apply(p, x), x)

        xt = x.transpose(0, 2, 1)
        t_xt = timeit(lambda x: x + conv_unit_apply_t(p, x), xt)

        t_nat = timeit(lambda x: pk.conv_unit.conv_unit(x, p), x)
        t_ct = timeit(lambda x: pk.conv_unit.conv_unit_ct(x, p), xt)

        fmt = lambda t: f"{t*1e3:7.3f}ms({flops/t/1e12:5.1f}TF/s)"
        print(f"B{B} T{T:6d} C{C:3d}: xla {fmt(t_ref)} | xla-T {fmt(t_xt)} | "
              f"pallas-nat {fmt(t_nat)} | pallas-cT {fmt(t_ct)}")


if __name__ == "__main__":
    main()
