"""Runtime subsystems: native checkpoints, batched streaming, converter CLI."""

import numpy as np

import jax

from l3ac_tpu.config import get_config
from l3ac_tpu.models import codec as fcodec
from l3ac_tpu.models.zoo import get_model
from l3ac_tpu.runtime import checkpoint
from l3ac_tpu.runtime.streaming import StreamCodec

RNG = np.random.default_rng(9)


def test_checkpoint_roundtrip(tmp_path):
    mc = get_config("debug").network_config
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc)
    path = tmp_path / "debug.npz"
    checkpoint.save_params(path, params)
    loaded = checkpoint.load_params(path)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(loaded)[0]
    assert len(flat1) == len(flat2)
    for (p1, v1), (p2, v2) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_sharded_checkpoint_restores_onto_mesh(tmp_path):
    """Orbax sharded checkpoint (SURVEY §5 checkpoint/resume): save a pytree,
    restore directly INTO a (dp,sp,tp) mesh placement — values identical and
    tp-sharded leaves land sharded (no host-side gather of the full model)."""
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from l3ac_tpu.parallel import sharding as shrd
    from l3ac_tpu.parallel.mesh import make_mesh

    mc = get_config("debug").network_config
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc)
    path = tmp_path / "sharded_ck"
    checkpoint.save_sharded(path, params)

    mesh = make_mesh(dp=2, sp=2, tp=2)
    sh = shrd.param_shardings(params, mesh)
    back = checkpoint.load_sharded(path, shardings=sh)
    for (p1, v1), (p2, v2) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    leaf = back["encoder"]["last_units"][0]["pw1"]["w"]
    assert "tp" in str(leaf.sharding.spec)


def test_stream_codec_tokens_match_reference_chunking():
    """Batched chunked encode must produce exactly the same tokens as the
    sequential reference-style extract_unit path (same 1-hop halo)."""
    model = get_model("debug", pretrained=False)
    hop = model.mc.hop_length
    sc = StreamCodec(model, chunk_seconds=hop * 16 / 16000, batch_size=4)

    audio = (RNG.standard_normal(hop * 40 - 7) * 0.3).astype(np.float32)

    chunk_idx, _ = model.extract_unit(audio[None], process_window=hop * 16)
    got_tokens = sc.encode_streams([audio])[0]
    np.testing.assert_array_equal(got_tokens, np.asarray(chunk_idx.data))


def test_stream_codec_decode_single_chunk_exact():
    """A stream that fits one chunk must decode exactly like direct decode."""
    model = get_model("debug", pretrained=False)
    hop = model.mc.hop_length
    sc = StreamCodec(model, chunk_seconds=hop * 32 / 16000, batch_size=2)

    audio = (RNG.standard_normal((1, hop * 8)) * 0.3).astype(np.float32)
    q, _ = model.encode_audio(audio)
    want = np.asarray(model.decode_audio(audio_feature=q))[0]
    got = sc.decode_streams([np.asarray(q[0])])[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_stream_codec_native_path_matches_python():
    from l3ac_tpu.runtime import native
    if not native.available():
        import pytest
        pytest.skip("native framer unavailable")
    model = get_model("debug", pretrained=False)
    hop = model.mc.hop_length
    sc = StreamCodec(model, chunk_seconds=hop * 12 / 16000, batch_size=3)
    streams = [(RNG.standard_normal(n) * 0.3).astype(np.float32)
               for n in (hop * 25, hop * 7 - 3, hop * 40 + 11)]
    t_py = sc.encode_streams(streams, use_native=False)
    t_nat = sc.encode_streams(streams, use_native=True)
    for a, b in zip(t_py, t_nat):
        np.testing.assert_array_equal(a, b)


def test_stream_codec_many_ragged_streams():
    model = get_model("debug", pretrained=False)
    hop = model.mc.hop_length
    sc = StreamCodec(model, chunk_seconds=hop * 8 / 16000, batch_size=3)
    lengths = [hop * 3, hop * 17 - 5, hop * 9 + 1, hop - 1, hop * 30]
    streams = [(RNG.standard_normal(n) * 0.3).astype(np.float32)
               for n in lengths]
    tokens = sc.encode_streams(streams)
    for t, n in zip(tokens, lengths):
        assert len(t) == int(np.ceil(n / hop))
