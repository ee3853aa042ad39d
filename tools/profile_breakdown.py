"""Per-stage timing breakdown on the real TPU: encoder / en_encoder / FSQ /
en_decoder / decoder, plus the fused roundtrip. Guides kernel work."""

import argparse
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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1kbps")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    cfg = get_config(args.model)
    mc = cfg.network_config
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=dtype)

    sr = cfg.sample_rate
    T = int(args.seconds * sr) // mc.hop_length * mc.hop_length
    audio = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T), dtype) * 0.3
    audio_sec = args.batch * T / sr

    enc = jax.jit(lambda p, a: fcodec.encoder_apply(p["encoder"], a[..., None], mc))
    feat = enc(params, audio)
    een = jax.jit(lambda p, f: fcodec.en_encoder_apply(p["en_encoder"], f, mc))
    tf = een(params, feat)
    qnt = jax.jit(lambda p, f: quantizer_apply(p["quantizer"], f, mc.vq))
    q, idx, _ = qnt(params, tf)
    ede = jax.jit(lambda p, f: fcodec.en_decoder_apply(p["en_decoder"], f, mc))
    qf = ede(params, q)
    dec = jax.jit(lambda p, f: fcodec.decoder_apply(p["decoder"], f, mc))
    _ = dec(params, qf)

    stages = {
        "encoder": lambda: enc(params, audio),
        "en_encoder": lambda: een(params, feat),
        "quantizer": lambda: qnt(params, tf),
        "en_decoder": lambda: ede(params, q),
        "decoder": lambda: dec(params, qf),
    }
    total = 0.0
    for name, fn in stages.items():
        dt = timeit(fn)
        total += dt
        print(f"{name:12s} {dt*1e3:8.2f} ms   rtf={audio_sec/dt:8.1f}")
    print(f"{'sum':12s} {total*1e3:8.2f} ms   rtf={audio_sec/total:8.1f}")

    rt = jax.jit(lambda p, a: fcodec.decode(p, fcodec.encode(p, a, mc)[0], mc))
    dt = timeit(rt, params, audio)
    print(f"{'roundtrip':12s} {dt*1e3:8.2f} ms   rtf={audio_sec/dt:8.1f}")


if __name__ == "__main__":
    main()
