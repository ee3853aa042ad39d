"""Empirical bisection of the conv_unit_ct kernel cost at stage2/3 shapes."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make(B, C, T, S, mode):
    halo = 3
    NT = T // S

    def _kernel(xp_ref, xc_ref, xn_ref, dww_ref, w1t_ref, w2t_ref, o_ref):
        t = pl.program_id(1)
        xc = xc_ref[0]
        if mode == "copy":
            o_ref[0] = xc
            return
        if "halo" in mode or mode == "full":
            prev = xp_ref[0, :, S - halo:]
            nxt = xn_ref[0, :, :halo]
            prev = jnp.where(t == 0, jnp.zeros_like(prev), prev)
            nxt = jnp.where(t == NT - 1, jnp.zeros_like(nxt), nxt)
            xpad = jnp.concatenate([prev, xc, nxt], axis=1).astype(jnp.float32)
        else:
            xpad = jnp.pad(xc.astype(jnp.float32), ((0, 0), (halo, halo)))
        if mode in ("halo_only",):
            o_ref[0] = xpad[:, halo:halo + S].astype(o_ref.dtype)
            return
        acc = xpad[:, halo:halo + S]
        if mode in ("dw", "full", "dw_mm"):
            acc = jnp.zeros((C, S), jnp.float32)
            for k in range(7):
                acc = acc + xpad[:, k:k + S] * dww_ref[:, k:k + 1].astype(jnp.float32)
        if mode in ("norm", "full"):
            u = jnp.mean(acc, axis=0, keepdims=True)
            s = jnp.mean((acc - u) ** 2, axis=0, keepdims=True)
            acc = (acc - u) / jnp.sqrt(s + 1e-8)
        if mode in ("mm", "full", "dw_mm"):
            h = jnp.dot(w1t_ref[...], acc.astype(w1t_ref.dtype),
                        preferred_element_type=jnp.float32)
            if mode == "full":
                a = jnp.float32(1.0)
                h = h + jnp.sin(a * h) ** 2
            y = jnp.dot(w2t_ref[...], h.astype(w2t_ref.dtype),
                        preferred_element_type=jnp.float32)
            acc = acc + y
        o_ref[0] = acc.astype(o_ref.dtype)

    def cur_map(b, t):
        return (b, 0, t)

    def prev_map(b, t):
        return (b, 0, jnp.maximum(t - 1, 0))

    def next_map(b, t):
        return (b, 0, jnp.minimum(t + 1, NT - 1))

    xspec = lambda imap: pl.BlockSpec((1, C, S), imap, memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)

    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T), dtype)
    dww = jax.random.normal(jax.random.PRNGKey(1), (C, 7), dtype)
    w1t = jax.random.normal(jax.random.PRNGKey(2), (4 * C, C), dtype) * 0.05
    w2t = jax.random.normal(jax.random.PRNGKey(3), (C, 4 * C), dtype) * 0.05

    @jax.jit
    def run(x):
        return pl.pallas_call(
            _kernel,
            grid=(B, NT),
            in_specs=[xspec(prev_map), xspec(cur_map), xspec(next_map),
                      full(dww), full(w1t), full(w2t)],
            out_specs=xspec(cur_map),
            out_shape=jax.ShapeDtypeStruct((B, C, T), dtype),
        )(x, x, x, dww, w1t, w2t)

    return run, x


def main():
    for (B, C, T) in [(8, 96, 26624), (8, 48, 79872), (8, 24, 159744)]:
        for S in (2048, 8192):
            if T % S:
                continue
            line = f"B{B} C{C:3d} T{T} S{S}: "
            for mode in ["copy", "halo_only", "dw", "norm", "mm", "dw_mm", "full"]:
                run, x = make(B, C, T, S, mode)
                dt = timeit(run, x)
                line += f"{mode}={dt*1e3:.2f}ms "
            print(line)


if __name__ == "__main__":
    main()
