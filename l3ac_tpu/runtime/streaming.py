"""Batched, fixed-shape streaming — the TPU generalization of the reference's
sequential batch-1 ``ChunkData`` loop (``l3ac/codec.py:124-156``).

XLA wants static shapes; unbounded audio wants chunking. This module processes
B independent streams in lockstep over fixed-size chunks with a 1-hop halo
(identical overlap semantics to the reference), so one compiled program serves
arbitrarily long audio. Chunks of different streams are batched onto the MXU
together; tails are zero-padded and cropped on the host.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig
from ..models import codec as fcodec


@dataclass
class StreamState:
    """Host-side state of one logical stream."""
    audio: np.ndarray           # remaining samples (1-D)
    produced_tokens: list       # accumulated index chunks
    produced_features: list
    consumed: int = 0


class StreamCodec:
    """Fixed-shape chunked encode/decode over batches of streams."""

    def __init__(self, model, *, chunk_seconds: float = 5.0,
                 batch_size: int = 8):
        self.model = model
        self.mc = model.mc
        hop = self.mc.hop_length
        sr = model.config.sample_rate
        self.chunk_len = max(hop, int(chunk_seconds * sr) // hop * hop)
        self.prefix_len = hop
        self.batch_size = batch_size
        self.tok_chunk = self.chunk_len // hop
        self.tok_prefix = 1

        mc = self.mc
        self._encode = jax.jit(partial(fcodec.encode, mc=mc))
        self._decode = jax.jit(partial(fcodec.decode, mc=mc))
        self._decode_idx = jax.jit(partial(fcodec.decode_indices, mc=mc))

    # -- encode ------------------------------------------------------------
    def encode_streams(self, audios: list[np.ndarray],
                       use_native: bool | None = None) -> list[np.ndarray]:
        """Encode a list of variable-length streams -> per-stream token arrays.

        Streams are chunked with 1-hop overlap; chunk b of every stream is
        batched into one fixed-shape device call. Token outputs drop the
        overlap tokens exactly like ``ChunkData`` reassembly.

        ``use_native``: route host-side chunk assembly through the C++ framer
        (``l3ac_tpu.runtime.native``); default auto-detects availability.
        """
        from . import native as native_mod
        if use_native is None:
            use_native = native_mod.available()
        if use_native:
            return self._encode_streams_native(audios)
        hop = self.mc.hop_length
        padded = []
        for a in audios:
            a = np.asarray(a, np.float32).reshape(-1)
            pad = math.ceil(len(a) / hop) * hop - len(a)
            padded.append(np.pad(a, (0, pad)))
        n_chunks = [math.ceil(len(a) / self.chunk_len) for a in padded]
        total_chunks = max(n_chunks)

        tokens = [[] for _ in padded]
        in_len = self.prefix_len + self.chunk_len
        for c in range(total_chunks):
            batch_rows, row_ids = [], []
            for i, a in enumerate(padded):
                if c >= n_chunks[i]:
                    continue
                start = c * self.chunk_len
                lo = max(0, start - self.prefix_len)
                seg = a[lo:start + self.chunk_len]
                row = np.zeros(in_len, np.float32)
                # left-align with zero left-context for the first chunk,
                # right-pad the tail chunk
                row[:len(seg)] = seg
                batch_rows.append(row)
                row_ids.append((i, c, lo, len(seg)))
            while len(batch_rows) % self.batch_size and len(batch_rows) < self.batch_size:
                batch_rows.append(np.zeros(in_len, np.float32))
            x = jnp.asarray(np.stack(batch_rows))
            _, idx = self._encode(self.model.params, x)
            idx = np.asarray(idx)
            for r, (i, cc, lo, seg_len) in enumerate(row_ids):
                toks = idx[r][: math.ceil(seg_len / hop)]
                if cc > 0:
                    toks = toks[self.tok_prefix:]
                tokens[i].append(toks)
        return [np.concatenate(t) for t in tokens]

    def _encode_streams_native(self, audios: list[np.ndarray]) -> list[np.ndarray]:
        """Encode with C++-side chunk assembly + zero-copy batch buffers.

        The framer hands back (batch, prefix+chunk) rows with per-row valid
        lengths; rows are right-padded with zeros, which is transparent to the
        encoder (causal attention + per-position norms + zero conv padding),
        so tokens match the python path bit-for-bit.
        """
        from .native import NativeFramer

        hop = self.mc.hop_length
        framer = NativeFramer(self.chunk_len, self.prefix_len, self.batch_size)
        sids = []
        for a in audios:
            a = np.asarray(a, np.float32).reshape(-1)
            pad = math.ceil(len(a) / hop) * hop - len(a)
            sid = framer.add_stream()
            framer.feed(sid, np.pad(a, (0, pad)))
            framer.finish(sid)
            sids.append(sid)

        tokens: dict[int, dict[int, np.ndarray]] = {s: {} for s in sids}
        while framer.pending():
            rows, batch, row_sids, row_cids, valid = framer.next_batch()
            if rows == 0:
                break
            _, idx = self._encode(self.model.params, jnp.asarray(batch))
            idx = np.asarray(idx)
            for r in range(rows):
                sid, c = int(row_sids[r]), int(row_cids[r])
                n_tok = math.ceil(int(valid[r]) / hop)
                toks = idx[r][:n_tok]
                if c > 0:
                    toks = toks[self.tok_prefix:]
                tokens[sid][c] = toks
        return [np.concatenate([tokens[s][c] for c in sorted(tokens[s])])
                for s in sids]

    # -- decode ------------------------------------------------------------
    def decode_streams(self, features: list[np.ndarray],
                       lengths: list[int] | None = None) -> list[np.ndarray]:
        """Decode per-stream feature arrays (T_i, C) back to audio.

        Full interior chunks share one fixed-shape compiled program. Tail
        chunks are decoded at their *exact* token length (one cached compile
        per distinct tail size): the conv decoder's EnhanceBlock InstanceNorm
        is global over time, so zero-padding a tail would perturb the whole
        chunk — unlike the encoder, where trailing zeros are provably
        transparent (causal attention + per-position norms).
        """
        return self._decode_grouped(
            [np.asarray(f, np.float32) for f in features], lengths,
            self._decode)

    def decode_indices_streams(self, indices: list[np.ndarray],
                               lengths: list[int] | None = None
                               ) -> list[np.ndarray]:
        """Decode per-stream FSQ index arrays (T_i,) back to audio — the
        token-domain twin of :meth:`decode_streams` (reference ``decode_unit``
        indices path, ``l3ac/codec.py:149-156``)."""
        return self._decode_grouped(
            [np.asarray(i, np.int32) for i in indices], lengths,
            self._decode_idx)

    def _decode_grouped(self, arrays: list[np.ndarray], lengths, fn):
        hop = self.mc.hop_length
        tok_in = self.tok_prefix + self.tok_chunk
        n_chunks = [max(1, math.ceil(len(f) / self.tok_chunk)) for f in arrays]
        outs = [[None] * n_chunks[i] for i in range(len(arrays))]

        # gather all (stream, chunk) segments, grouped by segment token length
        groups: dict[int, list] = {}
        for i, f in enumerate(arrays):
            for c in range(n_chunks[i]):
                start = c * self.tok_chunk
                lo = max(0, start - self.tok_prefix)
                seg = f[lo:start + self.tok_chunk]
                groups.setdefault(len(seg), []).append((i, c, start - lo, seg))

        for seg_len, items in groups.items():
            for ofs in range(0, len(items), self.batch_size):
                batch = items[ofs:ofs + self.batch_size]
                x = np.stack([seg for (_, _, _, seg) in batch])
                if seg_len == tok_in and len(batch) < self.batch_size:
                    pad_rows = self.batch_size - len(batch)
                    x = np.concatenate(
                        [x, np.zeros((pad_rows, *x.shape[1:]), x.dtype)])
                audio = np.asarray(fn(self.model.params, jnp.asarray(x)))
                for r, (i, c, pre, _) in enumerate(batch):
                    outs[i][c] = audio[r][pre * hop:]

        result = [np.concatenate(o) for o in outs]
        if lengths is not None:
            result = [r[:l] for r, l in zip(result, lengths)]
        return result
