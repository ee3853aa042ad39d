"""Native C++ framer: build, chunk semantics parity with ChunkData, and
incremental (streaming-arrival) behavior."""

import numpy as np
import pytest

from l3ac_tpu.runtime import native
from l3ac_tpu.runtime.chunk import ChunkData

RNG = np.random.default_rng(23)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native framer unavailable")


def collect_chunks(framer, n_streams):
    """Drain the framer; returns per-stream list of (chunk_id, row) arrays."""
    out = {i: {} for i in range(n_streams)}
    while framer.pending():
        rows, batch, sids, cids, valid = framer.next_batch()
        if rows == 0:
            break
        for r in range(rows):
            out[int(sids[r])][int(cids[r])] = batch[r, :valid[r]].copy()
    return out


def test_matches_chunkdata_semantics():
    """SURVEY Appendix A.4 case: 1000 samples, chunk 300, prefix 30 ->
    chunk lengths [300, 330, 330, 130], identical contents."""
    data = RNG.standard_normal(1000).astype(np.float32)
    ref = ChunkData(chunk_len=300, prefix_len=30, original_data=data)

    f = native.NativeFramer(chunk_len=300, prefix_len=30, batch=4)
    sid = f.add_stream()
    f.feed(sid, data)
    f.finish(sid)
    chunks = collect_chunks(f, 1)[sid]
    got = [chunks[i] for i in sorted(chunks)]
    want = ref.chunk_data
    assert [len(c) for c in got] == [len(c) for c in want] == [300, 330, 330, 130]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))


def test_incremental_feed_equals_bulk():
    data = RNG.standard_normal(2500).astype(np.float32)
    ref = ChunkData(chunk_len=400, prefix_len=40, original_data=data)

    f = native.NativeFramer(chunk_len=400, prefix_len=40, batch=2)
    sid = f.add_stream()
    # dribble samples in odd-sized pieces
    i = 0
    for step in (137, 260, 999, 1, 700, 403):
        f.feed(sid, data[i:i + step])
        i += step
    assert i == 2500
    f.finish(sid)
    chunks = collect_chunks(f, 1)[sid]
    got = [chunks[i] for i in sorted(chunks)]
    for g, w in zip(got, ref.chunk_data):
        np.testing.assert_array_equal(g, np.asarray(w))


def test_save_restore_mid_flight_reproduces_batches():
    """Kill-and-resume: state saved mid-drain and restored into a FRESH framer
    must reproduce the exact remaining batch sequence (contents AND order —
    the round-robin queue is part of the state)."""
    lengths = [1000, 310, 2711, 90, 766]
    datas = [RNG.standard_normal(n).astype(np.float32) for n in lengths]

    def fresh():
        f = native.NativeFramer(chunk_len=300, prefix_len=30, batch=3)
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
    for _ in range(2):                         # process two batches, then "die"
        f1.next_batch()
    blob = f1.save_state()
    del f1
    f2 = native.NativeFramer(chunk_len=300, prefix_len=30, batch=3)
    f2.restore_state(blob)
    resumed = drain_seq(f2)

    assert len(resumed) == len(ref) - 2
    for got, want in zip(resumed, ref[2:]):
        assert got[0] == want[0]
        for g, w in zip(got[1:], want[1:]):
            np.testing.assert_array_equal(g, w)


def test_restore_rejects_mismatched_config():
    f = native.NativeFramer(chunk_len=300, prefix_len=30, batch=3)
    f.add_stream()
    blob = f.save_state()
    other = native.NativeFramer(chunk_len=200, prefix_len=30, batch=3)
    with pytest.raises(ValueError):
        other.restore_state(blob)


def test_many_streams_round_robin():
    lengths = [1000, 310, 2711, 90]
    datas = [RNG.standard_normal(n).astype(np.float32) for n in lengths]
    f = native.NativeFramer(chunk_len=300, prefix_len=30, batch=3)
    sids = []
    for d in datas:
        sid = f.add_stream()
        f.feed(sid, d)
        f.finish(sid)
        sids.append(sid)
    all_chunks = collect_chunks(f, len(sids))
    for sid, d in zip(sids, datas):
        ref = ChunkData(chunk_len=300, prefix_len=30, original_data=d)
        got = [all_chunks[sid][i] for i in sorted(all_chunks[sid])]
        want = ref.chunk_data
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, np.asarray(w))
