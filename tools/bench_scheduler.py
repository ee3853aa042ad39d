"""Aggregate-throughput bench for the mixed-config continuous-batching
scheduler (BASELINE.json configs 3 & 5): many ragged streams across TWO
checkpoints (1kbps + 3kbps) served concurrently by ``runtime.scheduler.
CodecServer`` — ENCODE and DECODE. Reports aggregate RTF (total audio
seconds / wall seconds) per direction and for the full roundtrip.

Wall time includes ALL host-side work (framing, batching, token scatter) —
this is the serving number, not a kernel number. Two waves of identical
length-distribution run per direction: wave A warms every compiled program
(including the per-tail-length decode shapes), wave B is timed steady-state.
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
    ap.add_argument("--length-palette", type=float, nargs="*",
                    default=[2.5, 5.0, 7.5, 10.0],
                    help="stream lengths (s) are drawn from this palette. "
                         "Decode tail chunks run at their EXACT token length "
                         "(the decoder's InstanceNorm is global over the "
                         "chunk, so zero-padding would change the audio — "
                         "see runtime.streaming.decode_streams), which costs "
                         "one compile per distinct tail; bucketing stream "
                         "lengths is the standard serving answer and what a "
                         "deployment should do")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=1,
                    help="time N identical waves per direction and report "
                         "each + the median (tunnel/host timing variance "
                         "between processes is large; medians within one "
                         "warmed process are the comparable number)")
    ap.add_argument("--chunk-seconds", type=float, default=5.0)
    ap.add_argument("--pcm16", action="store_true",
                    help="decode lanes emit int16 PCM from the device (the "
                         "16 kHz serving/WAV format; halves d2h result "
                         "traffic — quantization floor ~3e-5 rms)")
    ap.add_argument("--exact-sine", action="store_true",
                    help="exact Mosaic sin instead of the production fast "
                         "polynomial (see bench.py / BENCH_NOTES.md)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="serving dtype. bfloat16 is the production mode "
                         "(MXU-native, matches bench.py); float32 is the "
                         "like-for-like companion for the r3/r4 serving "
                         "numbers, which ran fp32 models")
    args = ap.parse_args()

    if not args.exact_sine:
        import os
        os.environ["L3AC_TPU_FAST_SINE"] = "1"

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"backend: {jax.default_backend()} "
          f"fast_sine={not args.exact_sine} dtype={args.dtype}")
    models = {name: get_model(name, pretrained=False, dtype=dtype)
              for name in args.models}
    server = CodecServer(models, chunk_seconds=args.chunk_seconds,
                         batch_size=args.batch, pcm16_output=args.pcm16)

    # one fixed length distribution reused by both waves so wave B's decode
    # tail shapes are exactly the ones wave A compiled
    plan = [(name, float(RNG.choice(args.length_palette)))
            for name in args.models
            for _ in range(args.streams_per_model)]

    def submit_wave():
        handles, total = [], 0.0
        for name, secs in plan:
            sr = models[name].config.sample_rate
            audio = (RNG.standard_normal(int(secs * sr)) * 0.3
                     ).astype(np.float32)
            handles.append((name, len(audio), server.submit(name, audio)))
            total += len(audio) / sr
        return handles, total

    import statistics

    def stat_delta(before):
        return {k: server.stats[k] - before[k] for k in server.stats}

    # ---- encode: wave A warms, waves B.. are timed
    wave_a, _ = submit_wave()
    server.drain()
    enc_dts, wave_b, total_audio = [], None, 0.0
    enc_stats = None
    for _ in range(args.repeat):
        wave_b, total_audio = submit_wave()
        before = dict(server.stats)
        t0 = time.perf_counter()
        server.drain()
        enc_dts.append(time.perf_counter() - t0)
        enc_stats = stat_delta(before)
    enc_dt = statistics.median(enc_dts)
    n_tokens = sum(len(server.tokens(h)) for _, _, h in wave_b)

    # ---- decode: wave A's tokens warm every tail shape, waves B.. are timed
    for name, length, h in wave_a:
        server.submit_decode(name, indices=server.tokens(h), length=length)
    server.drain()
    dec_dts, dec_handles = [], None
    dec_stats = None
    for _ in range(args.repeat):
        dec_handles = [server.submit_decode(name, indices=server.tokens(h),
                                            length=length)
                       for name, length, h in wave_b]
        before = dict(server.stats)
        t0 = time.perf_counter()
        server.drain()
        dec_dts.append(time.perf_counter() - t0)
        dec_stats = stat_delta(before)
    dec_dt = statistics.median(dec_dts)
    out_samples = sum(len(server.audio(h)) for h in dec_handles)
    if args.repeat > 1:
        print("encode walls (ms):",
              [round(d * 1e3, 1) for d in enc_dts])
        print("decode walls (ms):",
              [round(d * 1e3, 1) for d in dec_dts])

    print(f"streams/wave: {len(wave_b)} across {list(models)}  "
          f"audio: {total_audio:.1f}s  tokens: {n_tokens}  "
          f"decoded samples: {out_samples}")
    print(f"device interactions/wave: encode {enc_stats}  decode {dec_stats}"
          f"  (serving roofline: wall ~= programs x dispatch_floor + "
          f"fetches x fetch_floor on the tunnel)")
    print(f"encode  wall: {enc_dt*1e3:8.1f} ms  aggregate RTF: "
          f"{total_audio/enc_dt:8.1f}x")
    print(f"decode  wall: {dec_dt*1e3:8.1f} ms  aggregate RTF: "
          f"{total_audio/dec_dt:8.1f}x")
    rt = total_audio / (enc_dt + dec_dt)
    print(f"roundtrip (encode+decode) aggregate RTF: {rt:.1f}x")


if __name__ == "__main__":
    main()
