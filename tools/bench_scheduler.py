"""Aggregate-throughput bench for the mixed-config continuous-batching
scheduler (BASELINE.json configs 3 & 5): many ragged streams across TWO
checkpoints (1kbps + 3kbps) served concurrently by ``runtime.scheduler.
CodecServer``; reports aggregate encode RTF (total audio seconds / wall
seconds) and per-config stream counts.

Wall time includes ALL host-side work (framing, batching, token scatter) —
this is the serving number, not a kernel number.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from l3ac_tpu.models.zoo import get_model
from l3ac_tpu.runtime.scheduler import CodecServer

RNG = np.random.default_rng(31)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=["1kbps", "3kbps"])
    ap.add_argument("--streams-per-model", type=int, default=16)
    ap.add_argument("--min-seconds", type=float, default=2.0)
    ap.add_argument("--max-seconds", type=float, default=12.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk-seconds", type=float, default=5.0)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}")
    models = {name: get_model(name, pretrained=False) for name in args.models}
    server = CodecServer(models, chunk_seconds=args.chunk_seconds,
                         batch_size=args.batch)

    total_audio = 0.0
    handles = []
    for name in args.models:
        sr = models[name].config.sample_rate
        for _ in range(args.streams_per_model):
            secs = float(RNG.uniform(args.min_seconds, args.max_seconds))
            audio = (RNG.standard_normal(int(secs * sr)) * 0.3).astype(np.float32)
            handles.append(server.submit(name, audio))
            total_audio += len(audio) / sr

    # warm the compiled programs (one batch per config) outside the timing
    for _ in args.models:
        server.step()

    t0 = time.perf_counter()
    server.drain()
    dt = time.perf_counter() - t0

    n_tokens = sum(len(server.tokens(h)) for h in handles)
    print(f"streams: {len(handles)} across {list(models)}  "
          f"audio: {total_audio:.1f}s  tokens: {n_tokens}")
    print(f"wall: {dt*1e3:.1f} ms  aggregate encode RTF: {total_audio/dt:.1f}x")


if __name__ == "__main__":
    main()
