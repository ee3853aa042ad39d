"""ctypes bindings for the native (C++) stream framer.

Builds ``native/libframer.so`` on demand (g++; no pybind11 in this
environment) and exposes :class:`NativeFramer` — the host-side hot loop of the
streaming runtime: per-stream buffering, ChunkData-overlap chunk assembly, and
zero-copy fixed-shape batch filling. Falls back gracefully: callers check
:func:`available`.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
LIB_PATH = NATIVE_DIR / "libframer.so"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                       capture_output=True)
        return LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(LIB_PATH))
    lib.framer_create.restype = ctypes.c_void_p
    lib.framer_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    lib.framer_destroy.argtypes = [ctypes.c_void_p]
    lib.framer_add_stream.restype = ctypes.c_int
    lib.framer_add_stream.argtypes = [ctypes.c_void_p]
    lib.framer_feed.restype = ctypes.c_int
    lib.framer_feed.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.framer_finish_stream.restype = ctypes.c_int
    lib.framer_finish_stream.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.framer_next_batch.restype = ctypes.c_int
    lib.framer_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.framer_pending.restype = ctypes.c_int
    lib.framer_pending.argtypes = [ctypes.c_void_p]
    lib.framer_state_size.restype = ctypes.c_int64
    lib.framer_state_size.argtypes = [ctypes.c_void_p]
    lib.framer_save_state.restype = ctypes.c_int64
    lib.framer_save_state.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_int64]
    lib.framer_restore_state.restype = ctypes.c_int
    lib.framer_restore_state.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_uint8),
                                         ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeFramer:
    """Continuous-batching chunk feeder backed by the C++ framer."""

    def __init__(self, chunk_len: int, prefix_len: int, batch: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native framer unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.framer_create(chunk_len, prefix_len, batch)
        if not self._h:
            raise ValueError("invalid framer parameters")
        self.chunk_len = chunk_len
        self.prefix_len = prefix_len
        self.batch = batch
        self.row_len = chunk_len + prefix_len

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.framer_destroy(self._h)
            self._h = None

    def add_stream(self) -> int:
        return self._lib.framer_add_stream(self._h)

    def feed(self, stream_id: int, samples: np.ndarray) -> None:
        samples = np.ascontiguousarray(samples, np.float32)
        rc = self._lib.framer_feed(
            self._h, stream_id,
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            samples.size)
        if rc != 0:
            raise ValueError(f"feed failed: {rc}")

    def finish(self, stream_id: int) -> None:
        self._lib.framer_finish_stream(self._h, stream_id)

    def next_batch(self):
        """Returns (rows, batch_array (B, row_len) f32, stream_ids, chunk_ids,
        valid_lens); rows == 0 when nothing is ready."""
        out = np.zeros((self.batch, self.row_len), np.float32)
        sids = np.zeros(self.batch, np.int32)
        cids = np.zeros(self.batch, np.int64)
        valid = np.zeros(self.batch, np.int64)
        rows = self._lib.framer_next_batch(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return rows, out, sids, cids, valid

    def pending(self) -> int:
        return self._lib.framer_pending(self._h)

    # -- restartable state (kill-and-resume; see framer.cpp) -----------------
    def save_state(self) -> bytes:
        """Serialize all framer state (stream buffers, chunk cursors, the
        round-robin queue) so a restored framer reproduces identical batches."""
        n = self._lib.framer_state_size(self._h)
        buf = np.zeros(n, np.uint8)
        wrote = self._lib.framer_save_state(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
        if wrote != n:
            raise RuntimeError(f"framer_save_state wrote {wrote}, expected {n}")
        return buf.tobytes()

    def restore_state(self, data: bytes) -> None:
        """Restore state saved by :meth:`save_state` into this framer. The
        framer must have the same chunk_len/prefix_len/batch configuration."""
        buf = np.frombuffer(data, np.uint8)
        rc = self._lib.framer_restore_state(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size)
        if rc != 0:
            raise ValueError(f"framer_restore_state failed: {rc}")
