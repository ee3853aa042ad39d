"""Mixed-config continuous-batching scheduler (BASELINE.json configs 3 & 5).

Serves streams of DIFFERENT lengths and DIFFERENT checkpoints (e.g. 1kbps and
3kbps) concurrently: one compiled fixed-shape program per config (XLA wants
static shapes — reference semantics from the sequential batch-1 chunk loop at
``l3ac/codec.py:124-156``), one shared host loop. Streams arrive (``submit`` /
``feed``) and depart (tokens collected) at any time; every device step packs up
to ``batch_size`` pending chunk-rows of ONE config — chunks of different
streams and different chunk positions batch together (continuous batching), so
a late-arriving stream's first chunk rides in the same MXU batch as an old
stream's tenth.

Host-side chunk assembly goes through the C++ framer
(``native/framer.cpp``) when built, with a pure-python framer fallback of
identical semantics. Token outputs are bit-identical to the sequential
``StreamCodec`` path (tested in ``tests/test_scheduler.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import codec as fcodec


class PyFramer:
    """Pure-python framer with the C++ framer's exact API and semantics:
    per-stream buffering, ChunkData 1-prefix overlap rows, round-robin
    continuous batch filling (``native/framer.cpp``)."""

    def __init__(self, chunk_len: int, prefix_len: int, batch: int):
        self.chunk_len = chunk_len
        self.prefix_len = prefix_len
        self.batch = batch
        self.row_len = chunk_len + prefix_len
        self._streams: list[dict] = []
        self._rr = 0  # round-robin cursor

    def add_stream(self) -> int:
        self._streams.append({"buf": np.zeros(0, np.float32), "consumed": 0,
                              "next_chunk": 0, "finished": False,
                              "done": False})
        return len(self._streams) - 1

    def feed(self, sid: int, samples: np.ndarray) -> None:
        s = self._streams[sid]
        assert not s["finished"]
        s["buf"] = np.concatenate([s["buf"],
                                   np.asarray(samples, np.float32).reshape(-1)])

    def finish(self, sid: int) -> None:
        s = self._streams[sid]
        s["finished"] = True
        if s["consumed"] + len(s["buf"]) <= s["next_chunk"] * self.chunk_len:
            s["done"] = True

    @staticmethod
    def _have(s: dict) -> int:
        """Total samples ever fed (consumed + still-buffered)."""
        return s["consumed"] + len(s["buf"])

    def _ready_chunk(self, s: dict) -> bool:
        if s["done"]:
            return False
        have = self._have(s)
        end = (s["next_chunk"] + 1) * self.chunk_len
        return have >= end or (s["finished"]
                               and have > s["next_chunk"] * self.chunk_len)

    def pending(self) -> int:
        """Chunk rows ready to emit right now (same contract as the C++
        ``framer_pending``)."""
        n = 0
        for s in self._streams:
            if s["done"]:
                continue
            have = self._have(s)
            limit = have if s["finished"] else (have // self.chunk_len
                                                * self.chunk_len)
            n += max(0, math.ceil((limit - s["next_chunk"] * self.chunk_len)
                                  / self.chunk_len))
        return n

    def next_batch(self):
        out = np.zeros((self.batch, self.row_len), np.float32)
        sids = np.zeros(self.batch, np.int32)
        cids = np.zeros(self.batch, np.int64)
        valid = np.zeros(self.batch, np.int64)
        rows = 0
        n = len(self._streams)
        scanned = 0
        while rows < self.batch and scanned < n:
            sid = (self._rr + scanned) % n
            s = self._streams[sid]
            if self._ready_chunk(s):
                c = s["next_chunk"]
                start = c * self.chunk_len
                lo = max(0, start - self.prefix_len)
                seg = s["buf"][lo - s["consumed"]:
                               start + self.chunk_len - s["consumed"]]
                out[rows, :len(seg)] = seg
                sids[rows] = sid
                cids[rows] = c
                valid[rows] = len(seg)
                s["next_chunk"] += 1
                # trim samples no longer needed (keep the next chunk's prefix)
                # so long-lived streams don't grow memory unboundedly
                next_lo = max(0, s["next_chunk"] * self.chunk_len
                              - self.prefix_len)
                if next_lo > s["consumed"]:
                    drop = min(next_lo - s["consumed"], len(s["buf"]))
                    s["buf"] = s["buf"][drop:]
                    s["consumed"] += drop
                if s["finished"] and (s["next_chunk"] * self.chunk_len
                                      >= self._have(s)):
                    s["done"] = True
                rows += 1
            else:
                scanned += 1
        self._rr = (self._rr + 1) % max(1, n)
        return rows, out, sids, cids, valid

    # -- restartable state (same contract as NativeFramer.save_state) -------
    _STATE_MAGIC = b"L3ACFRP1"

    def save_state(self) -> bytes:
        """Serialize all framer state (buffers, chunk cursors, the round-robin
        cursor) so a restored framer reproduces identical batches."""
        import struct
        parts = [self._STATE_MAGIC,
                 struct.pack("<5q", self.chunk_len, self.prefix_len,
                             self.batch, self._rr, len(self._streams))]
        for s in self._streams:
            parts.append(struct.pack("<5q", s["consumed"], s["next_chunk"],
                                     int(s["finished"]), int(s["done"]),
                                     len(s["buf"])))
            parts.append(np.asarray(s["buf"], np.float32).tobytes())
        return b"".join(parts)

    def restore_state(self, data: bytes) -> None:
        import struct
        if data[:8] != self._STATE_MAGIC:
            raise ValueError("not a PyFramer state blob")
        ofs = 8
        chunk_len, prefix_len, batch, rr, n = struct.unpack_from("<5q", data, ofs)
        ofs += 40
        if (chunk_len, prefix_len, batch) != (self.chunk_len, self.prefix_len,
                                              self.batch):
            raise ValueError("state from a differently-configured framer")
        streams = []
        for _ in range(n):
            consumed, next_chunk, finished, done, blen = struct.unpack_from(
                "<5q", data, ofs)
            ofs += 40
            buf = np.frombuffer(data, np.float32, count=blen, offset=ofs).copy()
            ofs += blen * 4
            streams.append({"buf": buf, "consumed": consumed,
                            "next_chunk": next_chunk,
                            "finished": bool(finished), "done": bool(done)})
        self._streams = streams
        self._rr = rr


def _make_framer(chunk_len: int, prefix_len: int, batch: int,
                 use_native: bool | None):
    from . import native as native_mod
    if use_native is None:
        use_native = native_mod.available()
    if use_native:
        return native_mod.NativeFramer(chunk_len, prefix_len, batch)
    return PyFramer(chunk_len, prefix_len, batch)


@dataclass
class _ConfigLane:
    """Per-config compiled program + framer + live stream bookkeeping."""
    model: object
    framer: object
    hop: int
    tok_prefix: int = 1
    handles: dict = field(default_factory=dict)   # local sid -> global handle


@dataclass
class _Stream:
    config: str
    sid: int                                       # framer-local stream id
    tokens: dict = field(default_factory=dict)     # chunk id -> token array
    fed: int = 0                                   # samples fed (pre-pad)
    expected_chunks: int | None = None             # known after finish()
    padded_len: int = 0

    @property
    def done(self) -> bool:
        return (self.expected_chunks is not None
                and len(self.tokens) == self.expected_chunks)


class CodecServer:
    """Continuous-batching encode server over multiple model configs.

    ``models``: {name: zoo model (has .params, .mc, .config)}. One jitted
    encode program per config; chunk shape = ``chunk_seconds`` rounded down to
    a hop multiple per config, plus a 1-hop prefix (ChunkData semantics).
    """

    def __init__(self, models: dict, *, chunk_seconds: float = 5.0,
                 batch_size: int = 8, use_native: bool | None = None):
        self.batch_size = batch_size
        self.lanes: dict[str, _ConfigLane] = {}
        self.streams: dict[int, _Stream] = {}
        self._next_handle = 0
        for name, model in models.items():
            mc = model.mc
            hop = mc.hop_length
            sr = model.config.sample_rate
            chunk_len = max(hop, int(chunk_seconds * sr) // hop * hop)
            lane = _ConfigLane(
                model=model,
                framer=_make_framer(chunk_len, hop, batch_size, use_native),
                hop=hop)
            lane.encode = jax.jit(partial(fcodec.encode, mc=mc))
            self.lanes[name] = lane

    # -- stream lifecycle ---------------------------------------------------
    def submit(self, config: str, audio: np.ndarray | None = None) -> int:
        """Register a new stream on ``config``; optionally feed+finish its
        whole audio at once. Returns a handle for :meth:`tokens`."""
        lane = self.lanes[config]
        sid = lane.framer.add_stream()
        handle = self._next_handle
        self._next_handle += 1
        st = _Stream(config=config, sid=sid)
        self.streams[handle] = st
        lane.handles[sid] = handle
        if audio is not None:
            self.feed(handle, audio)
            self.finish(handle)
        return handle

    def feed(self, handle: int, samples: np.ndarray) -> None:
        st = self.streams[handle]
        lane = self.lanes[st.config]
        samples = np.asarray(samples, np.float32).reshape(-1)
        st.fed += len(samples)
        lane.framer.feed(st.sid, samples)

    def finish(self, handle: int) -> None:
        """No more samples will arrive; right-pad to a hop multiple (reference
        preprocess, ``l3ac/codec.py:79-84``) and mark the expected chunk count."""
        st = self.streams[handle]
        assert st.fed > 0, "cannot finish an empty stream"
        lane = self.lanes[st.config]
        pad = math.ceil(st.fed / lane.hop) * lane.hop - st.fed
        if pad:
            lane.framer.feed(st.sid, np.zeros(pad, np.float32))
        st.padded_len = st.fed + pad
        lane.framer.finish(st.sid)
        st.expected_chunks = max(1, math.ceil(st.padded_len
                                              / lane.framer.chunk_len))

    # -- scheduling ---------------------------------------------------------
    def _pick_lane(self) -> str | None:
        """Config with the most pending chunk-rows (keeps batches full)."""
        best, best_n = None, 0
        for name, lane in self.lanes.items():
            n = lane.framer.pending()
            if n > best_n:
                best, best_n = name, n
        return best

    def step(self) -> bool:
        """Run ONE fixed-shape device batch for the fullest config. Returns
        False when no work is pending."""
        name = self._pick_lane()
        if name is None:
            return False
        lane = self.lanes[name]
        rows, batch, sids, cids, valid = lane.framer.next_batch()
        if rows == 0:
            return False
        _, idx = lane.encode(lane.model.params, jnp.asarray(batch))
        idx = np.asarray(idx)
        for r in range(rows):
            st = self.streams[lane.handles[int(sids[r])]]
            c = int(cids[r])
            n_tok = math.ceil(int(valid[r]) / lane.hop)
            toks = idx[r][:n_tok]
            if c > 0:
                toks = toks[lane.tok_prefix:]
            st.tokens[c] = toks
        return True

    def drain(self) -> None:
        while self.step():
            pass

    # -- results ------------------------------------------------------------
    def done(self, handle: int) -> bool:
        return self.streams[handle].done

    def tokens(self, handle: int) -> np.ndarray:
        st = self.streams[handle]
        assert st.done, "stream not finished/processed; call drain() or step()"
        return np.concatenate([st.tokens[c] for c in sorted(st.tokens)])
