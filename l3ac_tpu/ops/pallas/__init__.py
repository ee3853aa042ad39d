"""Pallas TPU kernels for the hot ops.

Every kernel has a pure-jnp reference implementation in ``l3ac_tpu.ops``; the
kernels are drop-in replacements validated against those references in
``tests/test_pallas.py``.
"""

import os

import jax

from . import (conv_unit, first_block, int8_matmul, legacy_tail,  # noqa: F401
               local_attention)


def enabled() -> bool:
    """Use Pallas kernels on accelerator backends unless L3AC_TPU_NO_PALLAS.

    Disabled inside a sequence-parallel region: the kernels pad locally,
    while SP replaces every time-axis pad with a neighbor halo exchange
    (``l3ac_tpu.parallel.sp``). The jnp ops are SP-transparent; the kernels
    are not (yet).
    """
    from ...parallel import sp
    return (jax.default_backend() != "cpu"
            and not os.environ.get("L3AC_TPU_NO_PALLAS")
            and not sp.active())
