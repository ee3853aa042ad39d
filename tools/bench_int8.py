"""Micro-bench: fused int8 dequant-matmul vs dense bf16 matmul on the real TPU.

The int8 claim (ops/quantized.py) is HBM weight-streaming bandwidth at SMALL
batch — when M (= B*T rows) is small the matmul is weight-bound, and int8
halves the weight bytes vs bf16. This tool measures that directly across the
codec's matmul geometries and several M, printing per-case us/call and the
speedup, so the claim is evidence, not prose (VERDICT r1 item 8).

Timing: scan-chained slope (see bench.py) — the output is fed back into a dummy
dependency so the chain cannot be elided.
"""

import argparse
import functools
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from l3ac_tpu.ops import quantized
from l3ac_tpu.ops.pallas import int8_matmul as pk_q

RNG = np.random.default_rng(23)

# (K, N) geometries from the codec: ConvUnit pw1/pw2 at decoder dims 512/256,
# transformer qkv / ff w1 at feature_dim 128.
GEOMETRIES = [("pw1@512", 512, 2048), ("pw2@512", 2048, 512),
              ("pw1@256", 256, 1024), ("qkv@128", 128, 576),
              ("ffw1@128", 128, 682)]


def timeit(fn, x, k1=500, k2=5000, repeats=5):
    # These matmuls are ~2-20 us/call: the chain must accumulate tens of ms of
    # device time per measurement or the host-side timer jitter (~1-2 ms via
    # the axon relay) swamps the slope (round-2's 20/100 chains printed
    # negative microseconds).
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, iters):
        def step(c, _):
            out = fn(c)
            dep = (jnp.sum(out[..., :1].astype(jnp.float32)) * 1e-20
                   ).astype(c.dtype)
            return c + dep, ()
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    float(run(x, iters=k1))
    float(run(x, iters=k2))
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run(x, iters=k1)); t1 = time.perf_counter()
        float(run(x, iters=k2)); t2 = time.perf_counter()
        dts.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return statistics.median(dts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", type=int, nargs="*", default=[32, 128, 512, 4096],
                    help="M values (rows = B*T)")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}")
    print(f"{'case':10s} {'M':>6s} {'bf16 us':>9s} {'int8 us':>9s} {'speedup':>8s}")
    for name, K, N in GEOMETRIES:
        w = jnp.asarray(RNG.standard_normal((K, N)).astype(np.float32)) * 0.05
        w_q, scale = quantized.quantize_weight(w)
        w_bf = w.astype(jnp.bfloat16)
        for M in args.ms:
            x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32)
                            ).astype(jnp.bfloat16)
            dt_dense = timeit(
                lambda c: jnp.dot(c, w_bf, preferred_element_type=c.dtype), x)
            dt_int8 = timeit(
                lambda c: pk_q.int8_matmul(c, w_q, scale), x)
            print(f"{name:10s} {M:6d} {dt_dense*1e6:9.1f} {dt_int8*1e6:9.1f} "
                  f"{dt_dense/dt_int8:8.2f}")


if __name__ == "__main__":
    main()
