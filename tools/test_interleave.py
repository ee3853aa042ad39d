"""Empirically probe which lane/sublane interleave strategies Mosaic supports
on real TPU, and how fast each is at the stage3 up-path geometry.

Strategies for writing out[c, t*s+p] = phase_p[c, t]:
  A) strided store:      o_ref[0, :, p::s] = phase_p
  B) stack+reshape:      o_ref[0] = stack(phases, -1).reshape(C, S*s)
  C) sublane variant (natural layout): o_ref[0] = stack(phases, 1).reshape(S*s, C)
"""

import sys
import time
import functools
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np


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


def expect(tag, fn, x, want):
    try:
        got = np.asarray(jax.jit(fn)(x))
        ok = np.allclose(got.astype(np.float32), want.astype(np.float32),
                         atol=1e-2)
        dt = timeit(fn, x)
        print(f"{tag}: {'OK ' if ok else 'WRONG'}  {dt*1e3:6.3f} ms")
    except Exception as e:  # noqa
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:140]}")


def main():
    s = 2
    B, C, T = 8, 24, 79920
    S = 3840  # time tile
    NT = T // S
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T), jnp.bfloat16)
    xn = np.asarray(x, np.float32)
    want = np.repeat(xn, s, axis=2)  # phases all = x -> elementwise repeat

    xspec = pl.BlockSpec((1, C, S), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, C, S * s), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM)

    def kA(x_ref, o_ref):
        z = x_ref[0]
        for p in range(s):
            o_ref[0, :, p::s] = z

    def kB(x_ref, o_ref):
        z = x_ref[0]
        o_ref[0] = jnp.stack([z] * s, axis=-1).reshape(C, S * s)

    for tag, k in (("A lane strided store", kA), ("B lane stack+reshape", kB)):
        fn = lambda x, k=k: pl.pallas_call(
            k, grid=(B, NT), in_specs=[xspec], out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, C, T * s), x.dtype))(x)
        expect(tag, fn, x, want)

    # natural layout: (B, T, C) -> (B, T*s, C), sublane interleave
    xt = x.transpose(0, 2, 1)
    wantt = np.repeat(np.asarray(xt, np.float32), s, axis=1)
    xspec_t = pl.BlockSpec((1, S, C), lambda b, t: (b, t, 0),
                           memory_space=pltpu.VMEM)
    ospec_t = pl.BlockSpec((1, S * s, C), lambda b, t: (b, t, 0),
                           memory_space=pltpu.VMEM)

    def kC(x_ref, o_ref):
        z = x_ref[0]
        o_ref[0] = jnp.stack([z] * s, axis=1).reshape(S * s, C)

    def kD(x_ref, o_ref):
        z = x_ref[0]
        for p in range(s):
            o_ref[0, p::s, :] = z

    for tag, k in (("C subl stack+reshape", kC), ("D subl strided store", kD)):
        fn = lambda x, k=k: pl.pallas_call(
            k, grid=(B, NT), in_specs=[xspec_t], out_specs=ospec_t,
            out_shape=jax.ShapeDtypeStruct((B, T * s, C), x.dtype))(x)
        expect(tag, fn, xt, wantt)


if __name__ == "__main__":
    main()
