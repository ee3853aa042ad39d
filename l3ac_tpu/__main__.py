"""Command-line interface: ``python -m l3ac_tpu <command>``.

The reference has no CLI (``pyproject.toml`` defines no scripts — SURVEY L7);
this is a framework surface:

    python -m l3ac_tpu list
    python -m l3ac_tpu info   --model 1kbps
    python -m l3ac_tpu encode in.wav tokens.npz --model 1kbps [--pretrained]
    python -m l3ac_tpu decode tokens.npz out.wav

Tokens are stored as an ``.npz`` with the FSQ indices, the model name, and
the original sample count (so decode crops exactly). WAV I/O is PCM16 mono
at the model's sample rate (stdlib ``wave``; no librosa dependency).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load_model(name: str, pretrained: bool):
    from .models.zoo import get_model

    return get_model(name, pretrained=pretrained)


def cmd_list(args) -> int:
    from .config import list_models

    for name in sorted(list_models()):
        print(name)
    return 0


def cmd_info(args) -> int:
    from .models.zoo import get_model_info

    model = _load_model(args.model, args.pretrained)
    print(json.dumps(get_model_info(model), indent=1, default=str))
    return 0


def cmd_encode(args) -> int:
    from .utils.audio_io import read_wav

    model = _load_model(args.model, args.pretrained)
    sr = model.config.sample_rate
    audio, _ = read_wav(args.input, expect_rate=sr)
    _, indices = model.encode_audio(audio[None])
    np.savez(args.output, indices=np.asarray(indices[0]),
             model=args.model, length=len(audio))
    bps = len(audio) and (indices.shape[-1] *
                          np.ceil(np.log2(model.mc.vq.codebook_size))
                          / (len(audio) / sr))
    print(f"{args.input}: {len(audio)/sr:.2f}s -> {indices.shape[-1]} tokens "
          f"({bps:.0f} bps) -> {args.output}")
    return 0


def cmd_decode(args) -> int:
    from .utils.audio_io import write_wav

    with np.load(args.input, allow_pickle=False) as z:
        indices = z["indices"]
        model_name = str(z["model"])
        length = int(z["length"])
    model = _load_model(args.model or model_name, args.pretrained)
    audio = model.decode_audio(indices=indices[None], audio_length=length)
    write_wav(args.output, np.asarray(audio[0]), model.config.sample_rate)
    print(f"{args.input}: {indices.shape[-1]} tokens -> "
          f"{length/model.config.sample_rate:.2f}s -> {args.output}")
    return 0


def cmd_train(args) -> int:
    from .trainer import train

    train(args.config, steps=args.steps, batch=args.batch,
          seconds=args.seconds, tokens=args.tokens, dp=args.dp, sp=args.sp,
          tp=args.tp, lr=args.lr, spectral=args.spectral,
          drop_path_rate=args.drop_path, seed=args.seed, wav_dir=args.wav_dir,
          ckpt_dir=args.ckpt_dir, save_every=args.save_every,
          resume=args.resume)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m l3ac_tpu")
    sub = ap.add_subparsers(dest="command", required=True)

    sub.add_parser("list", help="list released model configs")

    p = sub.add_parser("info", help="model parameters / MACs / bitrate")
    p.add_argument("--model", default="1kbps")
    p.add_argument("--pretrained", action="store_true",
                   help="download + convert the released torch checkpoint")

    p = sub.add_parser("encode", help="WAV -> FSQ token .npz")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--model", default="1kbps")
    p.add_argument("--pretrained", action="store_true")

    p = sub.add_parser("decode", help="FSQ token .npz -> WAV")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--model", default=None,
                   help="override the model recorded in the token file")
    p.add_argument("--pretrained", action="store_true")

    p = sub.add_parser(
        "train", help="train on a (dp, sp, tp) mesh with optax + spectral "
                      "loss, orbax sharded checkpoints, --resume restart")
    p.add_argument("--config", default="debug")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seconds", type=float, default=None,
                   help="clip length (rounded down to a hop multiple); "
                        "default --tokens")
    p.add_argument("--tokens", type=int, default=8,
                   help="clip length in codec tokens (hop multiples)")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--spectral", action="store_true",
                   help="add multi-resolution STFT + log-mel losses")
    p.add_argument("--drop-path", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--wav-dir", default=None,
                   help="train on random crops from *.wav here (synthetic "
                        "noise feed otherwise)")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--save-every", type=int, default=0,
                   help="orbax sharded checkpoint every K steps")
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest checkpoint in --ckpt-dir")

    args = ap.parse_args(argv)
    return {"list": cmd_list, "info": cmd_info,
            "encode": cmd_encode, "decode": cmd_decode,
            "train": cmd_train}[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
