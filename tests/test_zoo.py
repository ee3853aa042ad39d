"""Model zoo facade: construction, info, roundtrip, chunked streaming."""

import numpy as np

from l3ac_tpu.models.zoo import L3AC, get_model, get_model_info
from l3ac_tpu.config import get_config

RNG = np.random.default_rng(3)


def test_facade_roundtrip_debug():
    model = get_model("debug", pretrained=False)
    hop = model.mc.hop_length
    audio = RNG.standard_normal((1, hop * 7 - 5)).astype(np.float32) * 0.3
    out = model.roundtrip(audio)
    assert out.shape == audio.shape

    q, idx = model.encode_audio(audio)
    assert idx.shape[1] == int(np.ceil(audio.shape[1] / hop))
    out2 = model.decode_audio(indices=idx, audio_length=audio.shape[1])
    assert out2.shape == audio.shape


def test_model_info():
    model = get_model("debug", pretrained=False)
    info = get_model_info(model)
    assert info["codebook_size"] == 125
    assert info["params"] > 0


def test_chunked_streaming_matches_full():
    """Chunked extract/decode must agree with itself across window sizes on the
    overlap-reassembled interior (the reference pattern, l3ac/codec.py:124-156)."""
    model = get_model("debug", pretrained=False)
    hop = model.mc.hop_length
    audio = (RNG.standard_normal((1, hop * 40)) * 0.3).astype(np.float32)

    chunk_idx, chunk_feat = model.extract_unit(audio, process_window=hop * 16)
    out = model.decode_unit(chunk_q_feature=chunk_feat)
    assert out.shape[1] == audio.shape[1]

    # indices path produces identical audio
    out_idx = model.decode_unit(chunk_indices=chunk_idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_idx),
                               rtol=1e-4, atol=1e-5)
