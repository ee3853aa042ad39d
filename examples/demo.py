"""End-to-end demo mirroring the reference's ``example.py``.

Loads the 1kbps model, encodes+decodes a sample clip, prints MSE. With librosa
installed and network access it uses the libri1 clip exactly like the
reference demo (``/root/reference/example.py``, ``README.md:36-67``); otherwise
it falls back to a synthetic speech-like chirp so the pipeline is runnable
anywhere. Pretrained weights require network access to HuggingFace; pass
--random to run with random weights (pipeline demo only).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def load_sample(sample_rate: int) -> np.ndarray:
    try:
        import librosa

        audio, sr = librosa.load(librosa.example("libri1"))
        audio = librosa.resample(audio[None, :], orig_sr=sr,
                                 target_sr=sample_rate)
        return audio.astype(np.float32)
    except Exception:
        t = np.arange(4 * sample_rate) / sample_rate
        f = 120 + 80 * np.sin(2 * np.pi * 1.3 * t)          # wobbling pitch
        audio = 0.4 * np.sin(2 * np.pi * np.cumsum(f) / sample_rate)
        audio *= (0.5 + 0.5 * np.sin(2 * np.pi * 2.7 * t))  # envelope
        return audio[None].astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1kbps")
    ap.add_argument("--random", action="store_true",
                    help="random weights (no download)")
    args = ap.parse_args()

    import l3ac_tpu
    from l3ac_tpu.models.zoo import get_model, get_model_info

    print("models:", l3ac_tpu.list_models())
    codec = get_model(args.model, pretrained=not args.random)
    print(f"loaded codec, sample rate: {codec.config.sample_rate}")
    print("model info:", get_model_info(codec))

    audio = load_sample(codec.config.sample_rate)
    print(f"audio shape: {audio.shape}")

    q_feature, indices = codec.encode_audio(audio)
    print(f"tokens: {indices.shape} ({codec.config.bps:.1f} bps)")
    out = codec.decode_audio(audio_feature=q_feature,
                             audio_length=audio.shape[-1])
    mse = float(((audio - np.asarray(out)) ** 2).mean())
    print(f"MSE: {mse}")


if __name__ == "__main__":
    main()
