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
