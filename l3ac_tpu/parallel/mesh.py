"""Device-mesh construction.

Axis convention (SURVEY.md §2.4 / §7.6):
- ``dp``   data parallel — independent audio streams; rides DCN across hosts.
- ``sp``   sequence parallel — time-axis sharding with halo exchange; rides ICI.
- ``tp``   tensor parallel — attention heads / MLP hidden dims; rides ICI.

The reference has no distributed code at all (SURVEY.md §2.4); this layer is
greenfield and uses jax.sharding + GSPMD collectives, not point-to-point
translation.

Expert parallelism is N/A (no MoE in the model family). Pipeline parallelism is
intentionally not implemented: the largest released model is ~10M params — the
whole model fits in a fraction of one chip's HBM, so PP would only add bubble
overhead (documented capability decision, SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

AXES = ("dp", "sp", "tp")


def make_mesh(dp: int = 1, sp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, sp, tp) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = dp * sp * tp
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)
