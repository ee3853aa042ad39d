"""Native checkpoint save/load for param pytrees.

A portable single-file ``.npz`` format: pytree paths are flattened to
``a/b/[2]/w`` keys (list indices bracketed). This replaces the reference's five
per-module torch ``.pt`` files with one self-contained artifact; converted
reference checkpoints round-trip through here so torch is only needed once at
convert time.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _flatten(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}[{i}]/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def _listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: _listify(v) for k, v in node.items()}
        if node and all(k.startswith("[") and k.endswith("]") for k in node):
            return [node[f"[{i}]"] for i in range(len(node))]
        return node

    return _listify(root)


def save_params(path: str | Path, params) -> None:
    np.savez_compressed(path, **_flatten(params))


def load_params(path: str | Path, *, to_jax: bool = True):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    if to_jax:
        import jax
        import jax.numpy as jnp
        tree = jax.tree.map(jnp.asarray, tree)
    return tree


# ---------------------------------------------------------------------------
# Sharded on-disk checkpoints (orbax) — the multi-host/pod-scale format
# (SURVEY §5 "checkpoint/resume"): each host writes only its shards, restore
# reshards directly onto a target mesh without materializing the full pytree
# on any one host. The npz format above remains the portable single-file
# interchange; this is the training/serving-at-scale path.
# ---------------------------------------------------------------------------


def save_sharded(path: str | Path, params) -> None:
    """Write a sharded orbax checkpoint of a (possibly device-sharded) pytree."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)
        ckptr.wait_until_finished()


def load_sharded(path: str | Path, *, template=None, shardings=None):
    """Restore an orbax checkpoint.

    ``shardings``: optional pytree of ``jax.sharding.Sharding`` (e.g. from
    ``parallel.sharding.param_shardings``) — arrays restore directly into that
    placement, so a pod restore never gathers the full model to one host.
    ``template``: optional abstract pytree (shape/dtype) when restoring
    without metadata assumptions; defaults to the checkpoint's own structure.
    """
    import jax
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if shardings is not None:
            if template is None:
                meta = ckptr.metadata(path).item_metadata.tree
                template = jax.tree.map(
                    lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta,
                    is_leaf=lambda m: hasattr(m, "shape"))
            abstract = jax.tree.map(
                lambda t, s: jax.ShapeDtypeStruct(t.shape, t.dtype,
                                                  sharding=s),
                template, shardings)
            return ckptr.restore(path, abstract)
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)
