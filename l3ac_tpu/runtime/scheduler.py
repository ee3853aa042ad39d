"""Mixed-config continuous-batching scheduler (BASELINE.json configs 3 & 5).

Serves encode AND decode streams of DIFFERENT lengths and DIFFERENT
checkpoints (e.g. 1kbps and 3kbps) concurrently: one compiled fixed-shape
program per (config, direction) lane (XLA wants static shapes — reference
semantics from the sequential batch-1 chunk loop at ``l3ac/codec.py:124-156``),
one shared host loop. Streams arrive (``submit`` / ``submit_decode`` /
``feed``) and depart (tokens/audio collected) at any time; every device step
packs up to ``batch_size`` pending chunk-rows of ONE lane — chunks of
different streams and different chunk positions batch together (continuous
batching), so a late-arriving stream's first chunk rides in the same MXU batch
as an old stream's tenth.

Host-side chunk assembly goes through the C++ framer
(``native/framer.cpp``) when built, with a pure-python framer fallback of
identical semantics. Token outputs are bit-identical to the sequential
``StreamCodec`` path (tested in ``tests/test_scheduler.py``).

Data-parallel serving: pass ``mesh=`` and every device step's rows shard over
the mesh's ``dp`` axis (GSPMD; params replicated). The dp axis is the
DCN-aligned hosts axis of ``parallel.distributed.multihost_mesh``, so on a
pod the same host loop drives per-host stream batches while sp/tp collectives
stay on ICI.
"""

from __future__ import annotations

import math
import time
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


def _put_global(x, sharding):
    """``device_put`` that also works when ``sharding`` spans OTHER processes
    (true multi-host serving): every process holds the same full-value ``x``
    (the host loops run in lockstep) and contributes its addressable shards."""
    if jax.process_count() > 1:
        xn = np.asarray(x)
        return jax.make_array_from_callback(xn.shape, sharding,
                                            lambda idx: xn[idx])
    return jax.device_put(x, sharding)


def _make_framer(chunk_len: int, prefix_len: int, batch: int,
                 use_native: bool | None):
    from . import native as native_mod
    if use_native is None:
        use_native = native_mod.available()
    if use_native:
        return native_mod.NativeFramer(chunk_len, prefix_len, batch)
    return PyFramer(chunk_len, prefix_len, batch)


@dataclass
class _Lane:
    """One (config, direction) compiled program + framer + live streams.

    ``kind``: ``"enc"`` (audio -> FSQ indices), ``"dec_idx"`` (indices ->
    audio), ``"dec_feat"`` (quantized features -> audio). Decode lanes ride
    the SAME float32 framer as encode: FSQ indices are exact in float32 (all
    released codebooks < 2^24) and (T, C) features flatten row-major with a
    C-multiple chunk grid, so chunk boundaries always align to whole frames.
    """
    model: object
    framer: object
    hop: int
    kind: str
    width: int = 1                                 # flattened units per token
    tok_prefix: int = 1
    handles: dict = field(default_factory=dict)    # local sid -> global handle
    run: object = None                             # jitted program
    params: object = None                          # (dp: replicated) params
    last_served: int = 0                           # for lane aging
    in_cast: object = None                         # host-side pre-upload cast


@dataclass
class _Stream:
    lane: str                                      # lane key "config:kind"
    sid: int                                       # framer-local stream id
    out: dict = field(default_factory=dict)        # chunk id -> tokens/audio
    fed: int = 0                                   # units fed (samples/tokens)
    expected_chunks: int | None = None             # known after finish()
    padded_len: int = 0
    length: int | None = None                      # decode: output crop

    @property
    def done(self) -> bool:
        return (self.expected_chunks is not None
                and len(self.out) == self.expected_chunks)


class CodecServer:
    """Continuous-batching encode AND decode server over multiple configs.

    ``models``: {name: zoo model (has .params, .mc, .config)}. Three lanes per
    config (encode / decode-from-indices / decode-from-features), each with its
    own framer and compiled program; one shared host loop packs up to
    ``batch_size`` pending chunk-rows of ONE lane per device step. Chunk shape
    = ``chunk_seconds`` rounded down to a hop multiple, plus a 1-hop prefix
    (ChunkData semantics; reference serves both directions at
    ``l3ac/codec.py:113-156``).

    Decode chunks are shape-exact: interior rows run the fixed-size program;
    first/tail rows run at their exact token length (the decoder's
    InstanceNorm is global over time, so zero-padding would perturb the whole
    chunk — see ``streaming.decode_streams``). Rows of every exact-shape
    bucket are padded to ``batch_size`` so the compile count stays bounded by
    the number of distinct tail lengths.
    """

    #: wave-drain mega-batch palette cap: programs run at row counts
    #: ``rows_per_step * 2^k`` for k = 0..MAX_WAVE_LOG2 (bounded compile
    #: signatures; wave A of any steady workload warms them all)
    MAX_WAVE_LOG2 = 3

    def __init__(self, models: dict, *, chunk_seconds: float = 5.0,
                 batch_size: int = 8, use_native: bool | None = None,
                 aging_steps: int = 8, mesh=None, dp_axis: str = "dp",
                 pcm16_output: bool = False):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``dp_axis`` —
        data-parallel serving (BASELINE config 5). Every device step then
        packs ``batch_size * dp`` chunk-rows and shards them over ``dp_axis``
        via GSPMD (params replicated). On a real pod ``dp`` is the
        hosts-x-leftover-chips axis of ``parallel.distributed.multihost_mesh``
        (DCN-aligned), so stream batches split across hosts while sp/tp
        collectives stay on ICI; on one host it shards across local chips.

        ``pcm16_output``: decode lanes emit int16 PCM from the device (the
        audio is tanh-bounded; 16-bit PCM is the 16 kHz serving/WAV format)
        instead of float32 — halves device->host result traffic.
        :meth:`audio` still returns float32 (dequantized by /32767); quality
        cost is the PCM quantization floor (~3e-5 rms), far below the codec's
        own reconstruction error. Default off: results stay bit-identical to
        the sequential ``StreamCodec`` path.
        """
        self.pcm16_output = pcm16_output
        self.batch_size = batch_size
        self.aging_steps = aging_steps
        self.mesh = mesh
        self._dp = int(mesh.shape[dp_axis]) if mesh is not None else 1
        self.rows_per_step = batch_size * self._dp
        self._row_sharding = None
        self._param_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._row_sharding = NamedSharding(mesh, P(dp_axis))
            self._param_sharding = NamedSharding(mesh, P())
        self.lanes: dict[str, _Lane] = {}
        self.streams: dict[int, _Stream] = {}
        #: device-interaction counters since construction (serving roofline
        #: evidence: wall ~= programs * dispatch_floor + fetches * fetch_floor
        #: on latency-bound links; see BENCH_NOTES serving section). The t_*
        #: entries are cumulative seconds per drain phase: host batch
        #: assembly, host->device upload, program dispatch (async — excludes
        #: device execution, which lands in t_fetch's blocking copy), the
        #: device->host result fetch, and the host result scatter.
        self.stats = {"programs": 0, "fetches": 0, "t_assemble": 0.0,
                      "t_upload": 0.0, "t_dispatch": 0.0, "t_fetch": 0.0,
                      "t_scatter": 0.0, "t_gather": 0.0}
        self._next_handle = 0
        self._steps = 0
        self._inflight: list = []      # dispatched-but-uncollected results
        self._models = models
        self._chunk_seconds = chunk_seconds
        self._use_native = use_native
        for name, model in models.items():
            mc = model.mc
            hop = mc.hop_length
            sr = model.config.sample_rate
            chunk_len = max(hop, int(chunk_seconds * sr) // hop * hop)
            tok_chunk = chunk_len // hop
            if tok_chunk < 2:
                raise ValueError(
                    f"{name}: chunk_seconds={chunk_seconds} gives a "
                    f"{tok_chunk}-token chunk; decode lanes need >= 2 tokens "
                    f"per chunk (hop {hop} @ {sr} Hz)")
            C = mc.feature_dim

            params = model.params
            if self._param_sharding is not None:
                params = jax.tree.map(
                    lambda a: _put_global(a, self._param_sharding), params)
            # serve in the MODEL's dtype: framer rows are always float32 on
            # the host (indices are exact in f32), the lane programs cast at
            # the device boundary. bf16 models run the MXU at its native rate
            # AND halve decode result bytes (audio() upcasts on the host).
            pdt = jax.tree.leaves(params)[0].dtype
            # bf16 models: cast audio/feature rows to bf16 ON THE HOST before
            # upload — BIT-IDENTICAL to the device-side cast the lane program
            # performs anyway (same round-to-nearest-even), and it halves the
            # upload bytes on links where transfer dominates (the measured
            # tunnel moves ~25-40 MB/s effective through program inputs)
            host_cast = ((lambda a: a.astype(jnp.bfloat16))
                         if pdt == jnp.bfloat16 else None)

            enc = _Lane(model=model, hop=hop, kind="enc",
                        framer=_make_framer(chunk_len, hop,
                                            self.rows_per_step, use_native))
            enc.run = jax.jit(lambda p, x, _mc=mc, _dt=pdt: fcodec.encode(
                p, x.astype(_dt), mc=_mc))
            enc.params = params
            enc.in_cast = host_cast
            self.lanes[f"{name}:enc"] = enc

            def _dec_out(audio):
                if not pcm16_output:
                    return audio
                # upcast BEFORE the pcm scale: bf16's ~8-bit mantissa would
                # otherwise swamp the 16-bit quantization grid
                return jnp.round(audio.astype(jnp.float32)
                                 * 32767.0).astype(jnp.int16)

            di = _Lane(model=model, hop=hop, kind="dec_idx",
                       framer=_make_framer(tok_chunk, 1, self.rows_per_step,
                                           use_native))
            di.run = jax.jit(lambda p, x, _mc=mc: _dec_out(
                fcodec.decode_indices(p, x, mc=_mc)))
            di.params = params
            self.lanes[f"{name}:dec_idx"] = di

            df = _Lane(model=model, hop=hop, kind="dec_feat", width=C,
                       framer=_make_framer(tok_chunk * C, C,
                                           self.rows_per_step, use_native))
            df.run = jax.jit(lambda p, x, _mc=mc, _dt=pdt: _dec_out(
                fcodec.decode(p, x.astype(_dt), mc=_mc)))
            df.params = params
            df.in_cast = host_cast
            self.lanes[f"{name}:dec_feat"] = df

    # -- stream lifecycle ---------------------------------------------------
    def _new_stream(self, lane_key: str, length: int | None = None) -> int:
        lane = self.lanes[lane_key]
        sid = lane.framer.add_stream()
        handle = self._next_handle
        self._next_handle += 1
        self.streams[handle] = _Stream(lane=lane_key, sid=sid, length=length)
        lane.handles[sid] = handle
        return handle

    def submit(self, config: str, audio: np.ndarray | None = None) -> int:
        """Register a new encode stream on ``config``; optionally feed+finish
        its whole audio at once. Returns a handle for :meth:`tokens`."""
        handle = self._new_stream(f"{config}:enc")
        if audio is not None:
            self.feed(handle, audio)
            self.finish(handle)
        return handle

    def submit_decode(self, config: str, *, indices: np.ndarray | None = None,
                      features: np.ndarray | None = None,
                      length: int | None = None) -> int:
        """Register a decode stream on ``config`` (reference ``decompress`` /
        ``decode_unit``, ``l3ac/codec.py:118-122,149-156``). Feed FSQ indices
        OR quantized features (exactly one source per stream); ``length``
        crops the reassembled audio. Returns a handle for :meth:`audio`."""
        assert (indices is None) != (features is None), \
            "pass exactly one of indices/features (or neither + feed later)"
        kind = "dec_idx" if features is None else "dec_feat"
        handle = self._new_stream(f"{config}:{kind}", length=length)
        data = indices if features is None else features
        if data is not None:
            self.feed(handle, data)
            self.finish(handle)
        return handle

    def feed(self, handle: int, data: np.ndarray) -> None:
        """Append stream content: audio samples (encode), int indices
        (dec_idx), or (T, C) features (dec_feat)."""
        st = self.streams[handle]
        lane = self.lanes[st.lane]
        if lane.kind == "dec_feat":
            data = np.asarray(data, np.float32)
            assert data.ndim == 2 and data.shape[1] == lane.width, \
                f"features must be (T, {lane.width})"
            st.fed += data.shape[0]
            lane.framer.feed(st.sid, data.reshape(-1))
        elif lane.kind == "dec_idx":
            data = np.asarray(data).reshape(-1)
            st.fed += len(data)
            # float32 is exact for all released codebooks (< 2^24)
            lane.framer.feed(st.sid, data.astype(np.float32))
        else:
            data = np.asarray(data, np.float32).reshape(-1)
            st.fed += len(data)
            lane.framer.feed(st.sid, data)

    def finish(self, handle: int) -> None:
        """No more content will arrive. Encode streams right-pad to a hop
        multiple (reference preprocess, ``l3ac/codec.py:79-84``); decode
        streams need no padding (token grid is exact)."""
        st = self.streams[handle]
        assert st.fed > 0, "cannot finish an empty stream"
        lane = self.lanes[st.lane]
        if lane.kind == "enc":
            pad = math.ceil(st.fed / lane.hop) * lane.hop - st.fed
            if pad:
                lane.framer.feed(st.sid, np.zeros(pad, np.float32))
            st.padded_len = st.fed + pad
        else:
            st.padded_len = st.fed * lane.width
        lane.framer.finish(st.sid)
        st.expected_chunks = max(1, math.ceil(st.padded_len
                                              / lane.framer.chunk_len))

    # -- scheduling ---------------------------------------------------------
    def _pick_lane(self) -> str | None:
        """Lane with the most pending chunk-rows (keeps batches full), except
        that a ready lane unserved for ``aging_steps`` device steps wins
        outright — so sustained load on one lane cannot starve another."""
        ready = [(name, lane.framer.pending())
                 for name, lane in self.lanes.items()]
        ready = [(name, n) for name, n in ready if n > 0]
        if not ready:
            return None
        starved = [name for name, _ in ready
                   if self._steps - self.lanes[name].last_served
                   >= self.aging_steps]
        if starved:
            return min(starved, key=lambda n: self.lanes[n].last_served)
        return max(ready, key=lambda x: x[1])[0]

    def step(self) -> bool:
        """Run ONE device batch for the chosen lane. Returns False when no
        work is pending anywhere."""
        name = self._pick_lane()
        if name is None:
            return False
        lane = self.lanes[name]
        rows, batch, sids, cids, valid = lane.framer.next_batch()
        if rows == 0:
            return False
        self._steps += 1
        lane.last_served = self._steps
        if lane.kind == "enc":
            self._step_encode(lane, rows, batch, sids, cids, valid)
        else:
            self._step_decode(lane, rows, batch, sids, cids, valid)
        return True

    def _device_batch(self, x):
        if self._row_sharding is not None:
            return _put_global(x, self._row_sharding)
        return jnp.asarray(x)

    def _step_encode(self, lane, rows, batch, sids, cids, valid):
        # dispatch only — jax arrays are futures; the host loop keeps feeding
        # the device and results scatter later in _collect() (one sync per
        # drain instead of one per step)
        if lane.in_cast is not None:
            batch = lane.in_cast(batch)
        _, idx = lane.run(lane.params, self._device_batch(batch))
        self.stats["programs"] += 1
        # NOT sliced to real rows: token results are tiny, and on
        # latency-bound links a slice is an extra device program costing far
        # more than the padding rows' bytes; unsliced results also share ONE
        # shape per lane, so a whole drain stacks into one fetch per lane
        # (decode keeps slicing — audio padding rows are megabytes)
        self._inflight.append(("enc", lane, idx, rows, None,
                               sids.copy(), cids.copy(), valid.copy()))

    def _step_decode(self, lane, rows, batch, sids, cids, valid):
        # bucket rows by exact valid length: interior rows share the fixed
        # shape; first/tail rows compile once per distinct length
        buckets: dict[int, list[int]] = {}
        for r in range(rows):
            buckets.setdefault(int(valid[r]), []).append(r)
        for v, rs in buckets.items():
            n_tok = v // lane.width
            x = batch[rs][:, :v]
            if len(rs) < self.rows_per_step:  # row-pad: bounded compile count
                x = np.concatenate(
                    [x, np.zeros((self.rows_per_step - len(rs), v),
                                 np.float32)])
            if lane.kind == "dec_idx":
                xin = self._device_batch(x.astype(np.int32))
            else:
                xf = x.reshape(x.shape[0], n_tok, lane.width)
                if lane.in_cast is not None:
                    xf = lane.in_cast(xf)
                xin = self._device_batch(xf)
            audio = lane.run(lane.params, xin)
            self.stats["programs"] += 1
            if len(rs) < audio.shape[0] and audio.is_fully_addressable:
                audio = audio[:len(rs)]  # drop padding rows before transfer
                self.stats["programs"] += 1  # the slice program
            self._inflight.append(("dec", lane, audio, len(rs), rs,
                                   sids.copy(), cids.copy(), valid.copy()))

    # -- wave drain: mega-batched continuous batching at drain granularity --
    def _wave_sizes(self, n: int) -> list[int]:
        """Split ``n`` rows into palette program sizes (``rows_per_step *
        2^k``, k <= MAX_WAVE_LOG2), preferring ONE padded program — on
        latency-bound links (the axon tunnel measures ~15-25 ms dispatch
        overhead PER program) program count dominates padding-row cost, and
        on real PCIe bigger batches amortize dispatch all the same."""
        cap = self.rows_per_step << self.MAX_WAVE_LOG2
        out = []
        while n > cap:
            out.append(cap)
            n -= cap
        p = self.rows_per_step
        while p < n:
            p <<= 1
        out.append(p)
        return out

    def _gather_ready(self, lane):
        """Pull EVERY currently-ready chunk row out of a lane's framer."""
        outs, sids_l, cids_l, valid_l = [], [], [], []
        total = 0
        while True:
            rows, out, sids, cids, valid = lane.framer.next_batch()
            if rows == 0:
                break
            total += rows
            outs.append(out[:rows])
            sids_l.append(sids[:rows])
            cids_l.append(cids[:rows])
            valid_l.append(valid[:rows])
        if total == 0:
            return 0, None, None, None, None
        return (total, np.concatenate(outs), np.concatenate(sids_l),
                np.concatenate(cids_l), np.concatenate(valid_l))

    def _dispatch_wave(self) -> bool:
        """Dispatch ONE wave: every ready chunk-row of every lane, packed
        into the minimum number of palette-padded programs.

        This is :meth:`step`'s continuous batching applied at drain
        granularity: encode lanes share one row shape so a whole wave is
        1-2 programs per lane; decode rows bucket by exact valid length
        ACROSS the wave (not per batch_size step), so each distinct tail
        length costs one program per drain instead of one per step. Row
        results are independent in both directions (the decoder's
        InstanceNorm is per-row), so regrouping is bit-identical to the
        step() path — asserted by the scheduler tests, which compare both
        entry points against the sequential StreamCodec."""
        any_work = False
        for lane in self.lanes.values():
            tg = time.perf_counter()
            rows, out, sids, cids, valid = self._gather_ready(lane)
            self.stats["t_gather"] += time.perf_counter() - tg
            if not rows:
                continue
            any_work = True
            self._steps += 1
            lane.last_served = self._steps
            if lane.kind == "enc":
                start = 0
                for P in self._wave_sizes(rows):
                    t0 = time.perf_counter()
                    n = min(P, rows - start)
                    x = out[start:start + n]
                    if n < P:
                        x = np.concatenate(
                            [x, np.zeros((P - n, x.shape[1]), np.float32)])
                    if lane.in_cast is not None:
                        x = lane.in_cast(x)
                    t1 = time.perf_counter()
                    xd = self._device_batch(x)
                    t2 = time.perf_counter()
                    _, idx = lane.run(lane.params, xd)
                    t3 = time.perf_counter()
                    self.stats["t_assemble"] += t1 - t0
                    self.stats["t_upload"] += t2 - t1
                    self.stats["t_dispatch"] += t3 - t2
                    self.stats["programs"] += 1
                    sel = slice(start, start + n)
                    self._inflight.append(
                        ("enc", lane, idx, n, None, sids[sel].copy(),
                         cids[sel].copy(), valid[sel].copy()))
                    start += n
            else:
                buckets: dict[int, list[int]] = {}
                for r in range(rows):
                    buckets.setdefault(int(valid[r]), []).append(r)
                for v, rs in buckets.items():
                    n_tok = v // lane.width
                    x_full = out[rs][:, :v]
                    start = 0
                    for P in self._wave_sizes(len(rs)):
                        t0 = time.perf_counter()
                        n = min(P, len(rs) - start)
                        x = x_full[start:start + n]
                        if n < P:
                            x = np.concatenate(
                                [x, np.zeros((P - n, v), np.float32)])
                        t1 = time.perf_counter()
                        if lane.kind == "dec_idx":
                            xin = self._device_batch(x.astype(np.int32))
                        else:
                            xf = x.reshape(x.shape[0], n_tok, lane.width)
                            if lane.in_cast is not None:
                                xf = lane.in_cast(xf)
                            xin = self._device_batch(xf)
                        t2 = time.perf_counter()
                        audio = lane.run(lane.params, xin)
                        self.stats["t_assemble"] += t1 - t0
                        self.stats["t_upload"] += t2 - t1
                        self.stats["t_dispatch"] += time.perf_counter() - t2
                        self.stats["programs"] += 1
                        if n < audio.shape[0] and audio.is_fully_addressable:
                            audio = audio[:n]  # drop pad rows before transfer
                            self.stats["programs"] += 1  # the slice program
                        sel = np.asarray(rs[start:start + n])
                        self._inflight.append(
                            ("dec", lane, audio, n, list(range(n)),
                             sids[sel], cids[sel], valid[sel]))
                        start += n
        return any_work

    def _fetch_inflight(self) -> list:
        """One host copy of every in-flight device result, minimizing the
        NUMBER of device->host transfers: same-shape results are stacked on
        device and fetched as one array (transfer count, not bytes, dominates
        on latency-bound links; on PCIe the async-copy hints overlap the
        copies with still-running compute). Stack programs compile once per
        (shape, count) — bounded by the chunk-shape palette times the batch
        fan-in, and cached by XLA."""
        multihost = jax.process_count() > 1
        groups: dict[tuple, list[int]] = {}
        for i, item in enumerate(self._inflight):
            arr = item[2]
            groups.setdefault((arr.shape, str(arr.dtype)), []).append(i)
        stacks = []
        for idxs in groups.values():
            if len(idxs) == 1:
                stacks.append((idxs, self._inflight[idxs[0]][2]))
            else:
                stacks.append((idxs, jnp.stack(
                    [self._inflight[i][2] for i in idxs])))
        if multihost:
            # multi-host: results are globally sharded; every host needs the
            # full rows for framer bookkeeping. ONE process_allgather per
            # shape group (stacked on device first) — transfer COUNT, not
            # bytes, dominates on DCN exactly as on latency-bound PCIe, so
            # the single-process stacking strategy applies unchanged.
            from jax.experimental import multihost_utils
            gathered = [(idxs, np.asarray(multihost_utils.process_allgather(
                            s, tiled=True))) for idxs, s in stacks]
            fetched: list = [None] * len(self._inflight)
            for idxs, host in gathered:
                if len(idxs) == 1:
                    fetched[idxs[0]] = host
                else:
                    for j, i in enumerate(idxs):
                        fetched[i] = host[j]
            return fetched
        self.stats["fetches"] += len(stacks)
        self.stats["programs"] += sum(1 for idxs, _ in stacks
                                      if len(idxs) > 1)  # stack programs
        t0 = time.perf_counter()
        for _, s in stacks:
            if hasattr(s, "copy_to_host_async"):
                s.copy_to_host_async()
        fetched = [None] * len(self._inflight)
        for idxs, s in stacks:
            host = np.asarray(s)
            if len(idxs) == 1:
                fetched[idxs[0]] = host
            else:
                for j, i in enumerate(idxs):
                    fetched[i] = host[j]
        self.stats["t_fetch"] += time.perf_counter() - t0
        return fetched

    def _collect(self) -> None:
        """Scatter all dispatched device results into stream bookkeeping."""
        fetched = self._fetch_inflight()
        t0 = time.perf_counter()
        for arr, (kind, lane, _, rows, rs, sids, cids, valid) in zip(
                fetched, self._inflight):
            if kind == "enc":
                for r in range(rows):
                    st = self.streams[lane.handles[int(sids[r])]]
                    c = int(cids[r])
                    n_tok = math.ceil(int(valid[r]) / lane.hop)
                    toks = arr[r][:n_tok]
                    if c > 0:
                        toks = toks[lane.tok_prefix:]
                    st.out[c] = toks
            else:
                for j, r in enumerate(rs):
                    st = self.streams[lane.handles[int(sids[r])]]
                    c = int(cids[r])
                    a = arr[j]
                    if c > 0:
                        a = a[lane.tok_prefix * lane.hop:]
                    st.out[c] = a
        self.stats["t_scatter"] += time.perf_counter() - t0
        self._inflight.clear()

    def drain(self) -> None:
        """Process everything pending: wave-mode mega-batches (see
        :meth:`_dispatch_wave`), then one stacked fetch of all results."""
        while self._dispatch_wave():
            pass
        self._collect()

    # -- results ------------------------------------------------------------
    def done(self, handle: int) -> bool:
        self._collect()
        return self.streams[handle].done

    def tokens(self, handle: int) -> np.ndarray:
        self._collect()
        st = self.streams[handle]
        assert st.lane.endswith(":enc"), "tokens() is for encode streams"
        assert st.done, "stream not finished/processed; call drain() or step()"
        return np.concatenate([st.out[c] for c in sorted(st.out)])

    def audio(self, handle: int) -> np.ndarray:
        self._collect()
        st = self.streams[handle]
        assert not st.lane.endswith(":enc"), "audio() is for decode streams"
        assert st.done, "stream not finished/processed; call drain() or step()"
        out = np.concatenate([st.out[c] for c in sorted(st.out)])
        if out.dtype == np.int16:      # pcm16_output lanes: dequantize
            out = out.astype(np.float32) / 32767.0
        elif out.dtype != np.float32:  # bf16 models: upcast on the host
            out = out.astype(np.float32)
        return out[:st.length] if st.length is not None else out

    # -- restartable server state (minimal elastic recovery, SURVEY §5) -----
    def save_state(self) -> bytes:
        """Serialize ALL server state — framer buffers, stream bookkeeping,
        produced tokens/audio, the scheduling counters — so a killed server
        restored on the same models resumes mid-flight and produces identical
        results. Compiled programs are NOT state (XLA recompiles/caches)."""
        import io
        import json
        self._collect()                # flush in-flight device results first
        arrays: dict[str, np.ndarray] = {}
        meta = {"next_handle": self._next_handle, "steps": self._steps,
                "batch_size": self.batch_size,
                "chunk_seconds": self._chunk_seconds,
                "lanes": {}, "streams": {}}
        for name, lane in self.lanes.items():
            meta["lanes"][name] = {
                "last_served": lane.last_served,
                "handles": {str(k): v for k, v in lane.handles.items()}}
            arrays[f"framer::{name}"] = np.frombuffer(
                lane.framer.save_state(), np.uint8)
        for h, st in self.streams.items():
            meta["streams"][str(h)] = {
                "lane": st.lane, "sid": st.sid, "fed": st.fed,
                "expected_chunks": st.expected_chunks,
                "padded_len": st.padded_len, "length": st.length,
                "chunks": sorted(st.out)}
            for c in st.out:
                arrays[f"out::{h}::{c}"] = st.out[c]
        buf = io.BytesIO()
        np.savez(buf, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
                 **arrays)
        return buf.getvalue()

    def restore_state(self, data: bytes) -> None:
        """Restore :meth:`save_state` output into a freshly-constructed server
        over the SAME models (same configs, same batch/chunk geometry, same
        ``use_native`` setting — framer blobs are implementation-specific)."""
        import io
        import json
        with np.load(io.BytesIO(data)) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode())
            if set(meta["lanes"]) != set(self.lanes):
                raise ValueError(
                    f"lane mismatch: saved {sorted(meta['lanes'])} vs "
                    f"constructed {sorted(self.lanes)}")
            if meta["batch_size"] != self.batch_size:
                raise ValueError("batch_size mismatch")
            self._next_handle = meta["next_handle"]
            self._steps = meta["steps"]
            for name, lm in meta["lanes"].items():
                lane = self.lanes[name]
                lane.last_served = lm["last_served"]
                lane.handles = {int(k): v for k, v in lm["handles"].items()}
                lane.framer.restore_state(z[f"framer::{name}"].tobytes())
            self.streams = {}
            for hs, sm in meta["streams"].items():
                h = int(hs)
                st = _Stream(lane=sm["lane"], sid=sm["sid"], fed=sm["fed"],
                             expected_chunks=sm["expected_chunks"],
                             padded_len=sm["padded_len"], length=sm["length"])
                st.out = {c: z[f"out::{h}::{c}"] for c in sm["chunks"]}
                self.streams[h] = st
