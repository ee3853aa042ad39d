"""Pallas TPU kernels for the hot ops.

Every kernel has a pure-jnp reference implementation in ``l3ac_tpu.ops``; the
kernels are drop-in replacements validated against those references in
``tests/test_pallas.py``. All kernels are sequence-parallel capable: under
``parallel.sp`` the call sites pass halo-exchanged boundary blocks and edge
flags as explicit operands (see each kernel's ``lh``/``rh``/``edges`` args),
so the fused kernels run inside ``shard_map`` with exactly the monolithic
semantics.
"""

import os

import jax

from . import (conv_unit, first_block, int8_matmul, legacy_tail,  # noqa: F401
               local_attention, upsample)

# Test hook: force kernels on (in interpret mode) on CPU so the SP/shard_map
# kernel paths are testable without a TPU. Set by tests via force_interpret().
_FORCE_INTERPRET = False


def force_interpret(on: bool) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = on


def interpret_default() -> bool:
    """Resolved value for a kernel's ``interpret=None`` default."""
    return _FORCE_INTERPRET


def enabled() -> bool:
    """Use Pallas kernels on accelerator backends unless L3AC_TPU_NO_PALLAS.

    The env var wins even under ``force_interpret`` — the trainer scopes
    differentiation-unsafe kernels off with it (the kernels define no VJPs),
    and that must hold when tests have forced interpret mode on."""
    if os.environ.get("L3AC_TPU_NO_PALLAS"):
        return False
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() != "cpu"
