"""Sequence-parallel op context: per-op halo exchange under ``shard_map``.

This is the mechanism that runs the *actual* codec (encoder, en_coder stacks,
decoder — not toy convs) with the time axis sharded over a mesh axis, exactly
matching the monolithic computation. It is the TPU-idiomatic replacement for
the reference's sequential ``ChunkData`` streaming (``l3ac/codec.py:124-188``)
whose 1-hop prefix is *smaller* than the receptive field and therefore only
approximate; here every op exchanges exactly the halo it needs, so the sharded
result equals the single-device result to float tolerance (and FSQ indices
exactly).

Design: ops in ``l3ac_tpu.ops`` consult this module at trace time. Inside a
``with sequence_parallel("sp"):`` block (entered in the shard_map body), every
time-axis pad becomes a neighbor halo exchange (``ppermute``), edge shards are
filled with the op's own padding value (zero for convs/pools — identical to the
monolithic zero padding), clamp-style ops (linear upsample) fetch their 1-frame
neighbors with edge replication, windowed attention fetches the previous KV
window from the left neighbor, and the two global-over-time reductions in the
model (the reference's per-batch-scalar GRN and EnhanceBlock's InstanceNorm)
become ``psum``s.

The context is trace-time static: enter it inside the traced shard_map body
(see ``models.codec.encode_sp``). Functions here must not be wrapped in their
own ``jax.jit`` by callers that toggle the context between calls with
identical shapes — the jit cache does not key on it.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax.numpy as jnp
from jax import lax

_AXIS: list[str | None] = [None]


@contextmanager
def sequence_parallel(axis_name: str = "sp"):
    """Enable SP op behavior for ops traced inside this block. Must run inside
    a ``shard_map`` body whose mesh has ``axis_name``."""
    prev = _AXIS[0]
    _AXIS[0] = axis_name
    try:
        yield
    finally:
        _AXIS[0] = prev


def axis() -> str | None:
    return _AXIS[0]


def active() -> bool:
    return _AXIS[0] is not None


def index():
    return lax.axis_index(_AXIS[0])


def size() -> int:
    return lax.axis_size(_AXIS[0])


def _send_right(block: jnp.ndarray) -> jnp.ndarray:
    """Every shard sends ``block`` to its right neighbor; shard i receives
    shard i-1's block (shard 0 receives zeros from ppermute's missing edge)."""
    n = lax.axis_size(_AXIS[0])
    return lax.ppermute(block, _AXIS[0], [(i, i + 1) for i in range(n - 1)])


def _send_left(block: jnp.ndarray) -> jnp.ndarray:
    n = lax.axis_size(_AXIS[0])
    return lax.ppermute(block, _AXIS[0], [(i + 1, i) for i in range(n - 1)])


def halo_blocks(x: jnp.ndarray, left: int, right: int, *, axis: int = 1,
                fill: float = 0.0):
    """Fetch this shard's halo blocks from its neighbors (SP must be active).

    Returns ``(lh, rh)``: ``lh`` = the left neighbor's last ``left`` frames
    (``fill`` on the globally-first shard), ``rh`` = the right neighbor's first
    ``right`` frames (``fill`` on the globally-last shard); ``None`` where the
    requested width is 0. This is the building block consumed both by
    :func:`pad_time` (jnp ops) and by the SP-aware Pallas kernel wrappers,
    which take the halos as explicit operands instead of concatenating.
    """
    # halo exchange reaches only the immediate neighbor; a pad wider than the
    # per-shard length would silently wrap via negative slice starts
    if left > x.shape[axis] or right > x.shape[axis]:
        raise ValueError(
            f"SP halo ({left},{right}) exceeds per-shard length "
            f"{x.shape[axis]} on axis {axis}; use more samples per shard")
    n = lax.axis_size(_AXIS[0])
    idx = lax.axis_index(_AXIS[0])
    lh = rh = None
    if left:
        tail = lax.slice_in_dim(x, x.shape[axis] - left, x.shape[axis],
                                axis=axis)
        recv = _send_right(tail)
        lh = jnp.where(idx == 0, jnp.full_like(recv, fill), recv)
    if right:
        head = lax.slice_in_dim(x, 0, right, axis=axis)
        recv = _send_left(head)
        rh = jnp.where(idx == n - 1, jnp.full_like(recv, fill), recv)
    return lh, rh


def edge_flags() -> jnp.ndarray:
    """(2,) int32 [is_globally_first_shard, is_globally_last_shard] — consumed
    by SP-aware Pallas kernels to decide where zero-pad semantics apply."""
    idx = lax.axis_index(_AXIS[0])
    n = lax.axis_size(_AXIS[0])
    return jnp.stack([(idx == 0).astype(jnp.int32),
                      (idx == n - 1).astype(jnp.int32)])


def pad_time(x: jnp.ndarray, left: int, right: int, *, axis: int = 1,
             fill: float = 0.0) -> jnp.ndarray:
    """Time-axis padding that is SP-transparent.

    SP inactive: plain ``jnp.pad`` with ``fill``. SP active: the pad region is
    filled with the neighbor's boundary slice (halo exchange); the outermost
    shards get ``fill`` — exactly what the monolithic op's padding provides, so
    a subsequent VALID-window op reproduces the monolithic SAME-padded op.
    """
    if left == 0 and right == 0:
        return x
    if not active():
        pads = [(0, 0)] * x.ndim
        pads[axis] = (left, right)
        return jnp.pad(x, pads, constant_values=fill)
    lh, rh = halo_blocks(x, left, right, axis=axis, fill=fill)
    parts = [p for p in (lh, x, rh) if p is not None]
    return jnp.concatenate(parts, axis=axis)


def shift_right(x: jnp.ndarray, *, axis: int = 1) -> jnp.ndarray:
    """``x[t-1]`` with edge replication at the *global* left edge — the SP-aware
    form of ``concat([x[:1], x[:-1]])`` used by the linear upsample's clamp
    semantics (torch ``align_corners=False`` edge handling)."""
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    if active():
        tail = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
        recv = _send_right(tail)
        first = jnp.where(index() == 0, first, recv)
    rest = lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)
    return jnp.concatenate([first, rest], axis=axis)


def shift_left(x: jnp.ndarray, *, axis: int = 1) -> jnp.ndarray:
    """``x[t+1]`` with edge replication at the *global* right edge."""
    last = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    if active():
        head = lax.slice_in_dim(x, 0, 1, axis=axis)
        recv = _send_left(head)
        last = jnp.where(index() == size() - 1, last, recv)
    rest = lax.slice_in_dim(x, 1, x.shape[axis], axis=axis)
    return jnp.concatenate([rest, last], axis=axis)


def psum_if_active(x: jnp.ndarray) -> jnp.ndarray:
    """``psum`` over the sp axis when active — for the model's two
    global-over-time reductions (GRN ‖x‖₂, InstanceNorm moments)."""
    if active():
        return lax.psum(x, _AXIS[0])
    return x
