"""Multi-host initialization and mesh construction over {DCN, ICI}.

The reference has no distributed layer at all (SURVEY.md §2.4); this module is
the multi-host entry point: ``jax.distributed`` init, a hosts x chips mesh
where the ``dp`` (stream) axis rides DCN between hosts and ``sp``/``tp`` ride
ICI within a host's slice, and a barrier helper for restartable stream
scheduling.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import AXES

log = logging.getLogger("l3ac_tpu")


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op if single-process or already up).

    Must run before anything touches the XLA backend — so the already-up
    check uses ``jax.distributed.is_initialized()``, NOT ``process_count()``
    (which would itself initialize the backend)."""
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        return  # single-process; nothing to do
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info("jax.distributed up: process %d/%d, %d local devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count())


def multihost_mesh(sp: int = 1, tp: int = 1) -> Mesh:
    """Mesh with dp = hosts x leftover chips (DCN-aligned outer axis), sp/tp
    within a host's chips (ICI). Device order keeps each host's devices
    contiguous so sp/tp collectives never cross DCN."""
    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % (sp * tp) == 0, (n, sp, tp)
    dp = n // (sp * tp)
    return Mesh(devices.reshape(dp, sp, tp), AXES)


def barrier(name: str = "l3ac_tpu_barrier") -> None:
    """Cross-host barrier (used by the restartable stream scheduler —
    ``runtime.scheduler.CodecServer.save_state``/``restore_state`` — between
    checkpointed scheduling epochs)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
