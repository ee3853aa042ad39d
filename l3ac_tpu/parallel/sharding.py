"""GSPMD sharding rules for codec params and activations.

Approach (scaling-book recipe): pick a mesh, annotate param/activation
shardings, let XLA insert the collectives; no hand-written NCCL-style code.

Tensor-parallel ("tp") shards the big matmul dims:
- ConvUnit pw1 (dim -> 4*dim): output dim sharded; pw2 (4*dim -> dim): input
  dim sharded (Megatron-style pair — XLA inserts one reduce per unit).
- transformer qkv (dim -> 3*inner): output sharded (head-parallel);
  out-proj (inner -> dim): input sharded. ff w1/w2 likewise.
Everything else (small convs, norms, alphas) is replicated.

Activations: batch over "dp", time over "sp" (see halo.py for the exchange).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf, tp_size: int = 1) -> P:
    """Param-pytree path -> PartitionSpec. Dims not divisible by the tp axis
    size fall back to replication (e.g. ff_inner = 341 is odd)."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    name = "/".join(str(k) for k in keys)
    shape = leaf.shape
    if leaf.ndim < 2:
        return P()

    def ok(dim):
        return tp_size > 0 and shape[dim] % tp_size == 0

    # transformer blocks
    if ("qkv" in name or ("ff" in name and name.endswith("w1/w"))) and ok(1):
        return P(None, "tp")
    if (("attn" in name and name.endswith("out/w")) or
            ("ff" in name and name.endswith("w2/w"))) and ok(0):
        return P("tp", None)
    # ConvUnit pointwise pair
    if name.endswith("pw1/w") and ok(1):
        return P(None, "tp")
    if name.endswith("pw2/w") and ok(0):
        return P("tp", None)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedShardings for a codec param pytree."""
    tp = mesh.shape.get("tp", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, tp)),
        params)


def param_specs(params, tp_size: int = 1):
    """PartitionSpecs (for shard_map in_specs / pjit)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, leaf, tp_size), params)


def audio_sharding(mesh: Mesh, *, sp: bool = True) -> NamedSharding:
    """(B, T) audio: batch over dp, time over sp (matching the train step's
    sharding constraint)."""
    return NamedSharding(mesh, P("dp", "sp" if sp else None))


def feature_sharding(mesh: Mesh, *, sp: bool = False) -> NamedSharding:
    """(B, T, C) features."""
    return NamedSharding(mesh, P("dp", "sp" if sp else None, None))
