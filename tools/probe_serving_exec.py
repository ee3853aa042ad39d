"""Isolate device-execution time of the serving mega-batch programs from the
tunnel's dispatch/fetch latency: scan-slope timing (tools/profile_decoder
.timeit method) of fcodec.encode / decode_indices at the wave-drain program
shapes (rows_per_step * 2^k rows over one 5 s chunk). Explains the serving
wall: wall ~= exec + programs*dispatch + fetches*fetch_latency."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("L3AC_TPU_FAST_SINE", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from l3ac_tpu.config import get_config
from l3ac_tpu.models import codec as fcodec


def timeit(fn, x, k1=3, k2=13):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, iters):
        def step(c, _):
            out = fn(c)
            if isinstance(out, tuple):
                out = out[-1]
            dep = (jnp.sum(out[..., :4].astype(jnp.float32)) * 1e-20
                   ).astype(c.dtype)
            return c + dep, ()
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    float(run(x, iters=k1)); float(run(x, iters=k2))
    t0 = time.perf_counter(); float(run(x, iters=k1)); t1 = time.perf_counter()
    float(run(x, iters=k2)); t2 = time.perf_counter()
    return max(0.0, ((t2 - t1) - (t1 - t0)) / (k2 - k1))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "1kbps"
    cfg = get_config(name)
    mc = cfg.network_config
    sr = cfg.sample_rate
    hop = mc.hop_length
    chunk_len = max(hop, int(5.0 * sr) // hop * hop)
    row = chunk_len + hop                    # chunk + 1-hop prefix
    n_tok = row // hop
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc,
                               dtype=jnp.bfloat16)
    params = fcodec.attach_bias_caches(params, mc)
    print(f"{name}: chunk row={row} samples ({row/sr:.2f}s) tokens={n_tok}")

    enc = lambda a: fcodec.encode(params, a.astype(jnp.bfloat16), mc=mc)[1]
    for rows in (8, 16, 32):
        x = (np.random.default_rng(0).standard_normal((rows, row)) * 0.3
             ).astype(np.float32)
        dt = timeit(enc, jnp.asarray(x))
        print(f"encode rows={rows:3d}: {dt*1e3:8.2f} ms "
              f"({rows*row/sr/dt:.0f}x rt)")

    dec = lambda i: fcodec.decode_indices(params, i, mc=mc)
    idx = np.asarray(fcodec.encode(
        params, jnp.asarray((np.random.default_rng(1)
                             .standard_normal((32, row)) * 0.3)
                            .astype(np.float32)).astype(jnp.bfloat16),
        mc=mc)[1])
    for rows in (8, 16, 32):
        dt = timeit(dec, jnp.asarray(idx[:rows]))
        print(f"decode rows={rows:3d}: {dt*1e3:8.2f} ms "
              f"({rows*row/sr/dt:.0f}x rt)")


if __name__ == "__main__":
    main()
