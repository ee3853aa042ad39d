"""CLI surface (python -m l3ac_tpu): list / info / encode / decode roundtrip
through real WAV files on the debug model."""

import json

import numpy as np

from l3ac_tpu.__main__ import main
from l3ac_tpu.utils.audio_io import read_wav, write_wav


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    write_wav(p, x, sr)
    y, rate = read_wav(p, expect_rate=sr)
    assert rate == sr and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32767)


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "1kbps" in out and "debug" in out


def test_cli_encode_decode_roundtrip(tmp_path, capsys):
    sr = 16000
    t = np.arange(sr // 2, dtype=np.float32) / sr
    x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    wav_in = tmp_path / "in.wav"
    toks = tmp_path / "toks.npz"
    wav_out = tmp_path / "out.wav"
    write_wav(wav_in, x, sr)

    assert main(["encode", str(wav_in), str(toks), "--model", "debug"]) == 0
    with np.load(toks) as z:
        assert str(z["model"]) == "debug"
        assert int(z["length"]) == len(x)
        n_tokens = z["indices"].shape[-1]
    assert n_tokens > 0

    assert main(["decode", str(toks), str(wav_out)]) == 0
    y, rate = read_wav(wav_out)
    assert rate == sr and len(y) == len(x)
    assert np.isfinite(y).all()


def test_cli_info(capsys):
    assert main(["info", "--model", "debug"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert "params" in json.dumps(info) or info  # structured output exists
