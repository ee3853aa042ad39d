"""Benchmark: real-time factor of encode+decode on the flagship 1kbps model.

Run on real TPU hardware (ambient JAX_PLATFORMS=axon). Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

The reference publishes no speed numbers (BASELINE.md); the operational target
is the north star from BASELINE.json: >= 200x real-time encode+decode per v5e
chip at 1kbps. ``vs_baseline`` is therefore value / 200.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1kbps")
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="audio length per stream")
    ap.add_argument("--batch", type=int, default=8, help="concurrent streams")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from l3ac_tpu.config import get_config
    from l3ac_tpu.models import codec as fcodec

    cfg = get_config(args.model)
    mc = cfg.network_config
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=dtype)

    sr = cfg.sample_rate
    T = int(args.seconds * sr) // mc.hop_length * mc.hop_length
    audio = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T), dtype) * 0.3

    # Two-point scan-chained measurement: the TPU tunnel elides repeated
    # identical dispatches and block_until_ready does not force remote
    # completion, so chain the roundtrip inside one jit (iteration n+1's
    # input depends on iteration n's output), read back a scalar, and take
    # the slope between two chain lengths to cancel the fixed host-sync cost.
    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(params, audio, iters):
        def step(c, _):
            q, idx = fcodec.encode(params, c, mc)
            out = fcodec.decode(params, q, mc)
            dep = (jnp.sum(out[:1, :8].astype(jnp.float32)) * 1e-20
                   ).astype(c.dtype)
            return c + dep, ()
        y, _ = jax.lax.scan(step, audio, None, length=iters)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    k1 = max(1, args.iters // 4)
    k2 = args.iters
    float(run(params, audio, iters=k1))  # compile + warm
    float(run(params, audio, iters=k2))
    t0 = time.perf_counter()
    float(run(params, audio, iters=k1))
    t1 = time.perf_counter()
    float(run(params, audio, iters=k2))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (k2 - k1)

    audio_seconds = args.batch * (T / sr)
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": f"rtf_encode_decode_{args.model}",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
