"""torch -> JAX checkpoint converter.

Maps the reference's per-module ``.pt`` state dicts (``encoder.pt``,
``quantizer.pt``, ``decoder.pt``, ``en_encoder.pt``, ``en_decoder.pt`` —
reference ``xtract/nn/module.py:36-54``, ``l3ac/en_codec.py:46-51``) onto this
framework's param pytrees, folding torch weight-norm parametrizations
(``parametrizations.weight.original0/1`` -> ``W = g * v / ||v||``) at convert
time so runtime kernels see plain dense weights.

Layout transposes: torch conv (Cout, Cin/g, K) -> (K, Cin/g, Cout); torch
linear (Cout, Cin) -> (Cin, Cout).

Input state dicts are accepted as ``{key: np.ndarray}`` — use
:func:`load_torch_state_dict` to read a ``.pt`` file when torch is available.
"""

from __future__ import annotations

import numpy as np

from ..config import ModelConfig


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def _fold_wn(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.reshape(v.shape[0], *([1] * (v.ndim - 1))) * v / norm).astype(v.dtype)


def _weight(sd: dict, prefix: str) -> np.ndarray:
    """Return the (folded) torch-layout weight at ``prefix``."""
    wn_key = f"{prefix}.parametrizations.weight.original0"
    if wn_key in sd:
        return _fold_wn(sd[wn_key], sd[f"{prefix}.parametrizations.weight.original1"])
    return sd[f"{prefix}.weight"]


def _conv(sd: dict, prefix: str) -> dict:
    w = _weight(sd, prefix)                    # (Cout, Cin/g, K)
    return {"w": np.transpose(w, (2, 1, 0)), "b": sd[f"{prefix}.bias"]}


def _linear(sd: dict, prefix: str, bias: bool = True) -> dict:
    w = _weight(sd, prefix)                    # (Cout, Cin)
    p = {"w": np.transpose(w, (1, 0))}
    if bias:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _norm(sd: dict, prefix: str) -> dict:
    return {"w": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"]}


def _alpha(sd: dict, key: str) -> np.ndarray:
    return sd[key].reshape(-1)                 # Snake alpha (1,C,1)/(1,1,C) -> (C,)


def _grn(sd: dict, prefix: str) -> dict:
    return {"gamma": sd[f"{prefix}.gamma"].reshape(-1),
            "beta": sd[f"{prefix}.beta"].reshape(-1)}


def _conv_unit(sd: dict, prefix: str) -> dict:
    p = {
        "dw": _conv(sd, f"{prefix}.dw_conv"),
        "pw1": _linear(sd, f"{prefix}.pw_conv1"),
        "grn": _grn(sd, f"{prefix}.grn"),
        "pw2": _linear(sd, f"{prefix}.pw_conv2"),
    }
    if f"{prefix}.norm.weight" in sd:
        p["norm"] = _norm(sd, f"{prefix}.norm")
    if f"{prefix}.act.alpha" in sd:
        p["alpha"] = _alpha(sd, f"{prefix}.act.alpha")
    return p


def _legacy_unit(sd: dict, prefix: str) -> dict:
    # LegacyUnit.block = Sequential(Snake, Conv, Snake, Conv)
    return {
        "alpha1": _alpha(sd, f"{prefix}.block.0.alpha"),
        "conv1": _conv(sd, f"{prefix}.block.1"),
        "alpha2": _alpha(sd, f"{prefix}.block.2.alpha"),
        "conv2": _conv(sd, f"{prefix}.block.3"),
    }


def _base_block(sd: dict, prefix: str, n_branches: int) -> dict:
    # each branch = Sequential(TrendPool, Conv1d) -> conv at index 1
    return {"branches": [_conv(sd, f"{prefix}.blocks.{i}.1")
                         for i in range(n_branches)]}


def _first_block(sd: dict, prefix: str) -> dict:
    return {
        "base": _base_block(sd, prefix, 5),
        "conv1": _conv(sd, f"{prefix}.conv_1"),
        "conv2": _conv(sd, f"{prefix}.conv_2"),
    }


def _enhance_block(sd: dict, prefix: str) -> dict:
    return {
        "base": _base_block(sd, prefix, 4),
        "in_norm": _norm(sd, f"{prefix}.merge_layer.0"),
        "merge": _conv(sd, f"{prefix}.merge_layer.1"),
    }


def convert_encoder(sd: dict, mc: ModelConfig) -> dict:
    """Reference Encoder.blocks layout: [FirstBlock, (stage, down)*, last_stage,
    out_conv] (``l3ac/modules.py:82-113``)."""
    p = {"first": _first_block(sd, "blocks.0")}
    stages = []
    idx = 1
    n_stages = len(mc.compress_rates)
    for s in range(n_stages):
        depth = mc.encoder_depths[s]
        stage = {"units": [_conv_unit(sd, f"blocks.{idx}.{j}.module")
                           for j in range(depth)],
                 "down": _conv(sd, f"blocks.{idx + 1}.0")}
        if mc.use_norm:
            stage["down_norm"] = _norm(sd, f"blocks.{idx + 1}.1")
        stages.append(stage)
        idx += 2
    p["stages"] = stages
    p["last_units"] = [_conv_unit(sd, f"blocks.{idx}.{j}.module")
                       for j in range(mc.encoder_depths[-1])]
    p["out_conv"] = _conv(sd, f"blocks.{idx + 1}")
    return p


def convert_decoder(sd: dict, mc: ModelConfig) -> dict:
    """Reference Decoder.blocks layout: [in_conv, (stage, EnhanceBlock,
    up_layer)*, LastBlock] (``l3ac/modules.py:146-198``)."""
    p = {"in_conv": _conv(sd, "blocks.0")}
    stages = []
    idx = 1
    for s in range(len(mc.decode_rates)):
        depth = mc.decoder_depths[s]
        stage = {"units": [_conv_unit(sd, f"blocks.{idx}.{j}.module")
                           for j in range(depth)],
                 "enhance": _enhance_block(sd, f"blocks.{idx + 1}"),
                 "up_conv": _conv(sd, f"blocks.{idx + 2}.0")}
        if mc.use_norm:
            stage["up_norm"] = _norm(sd, f"blocks.{idx + 2}.2")
        stages.append(stage)
        idx += 3
    p["stages"] = stages

    # LastBlock.block = Sequential(tail_seq, Snake, Conv, Tanh)
    tail = f"blocks.{idx}.block"
    if mc.decoder_last_layer == "legacy":
        p["tail_units"] = [_legacy_unit(sd, f"{tail}.0.{j}.module")
                           for j in range(3)]
    elif mc.decoder_last_layer == "dilation":
        p["tail_units"] = [_conv_unit(sd, f"{tail}.0.{j}.module")
                           for j in range(3)]
    else:
        p["tail_units"] = [_conv_unit(sd, f"{tail}.0.{j}.module")
                           for j in range(2)]
    p["tail_alpha"] = _alpha(sd, f"{tail}.1.alpha")
    p["out_conv"] = _conv(sd, f"{tail}.2")
    return p


def convert_quantizer(sd: dict, mc: ModelConfig) -> dict:
    if "project_in.weight" not in sd:  # identity projections
        return {}
    return {
        "proj_in": _linear(sd, "project_in"),
        "proj_out": _linear(sd, "project_out"),
    }


def _local_trans(sd: dict, prefix: str, depth: int) -> dict:
    pre = f"{prefix}." if prefix else ""
    p = {"layers": []}
    if f"{pre}dynamic_pos_bias.mlp.0.weight" in sd:
        mlp = f"{pre}dynamic_pos_bias.mlp"
        p["dyn_bias"] = {}
        for i, seq in enumerate((0, 2, 4)):
            lin = _linear(sd, f"{mlp}.{seq}")
            p["dyn_bias"][f"w{i}"] = lin["w"]
            p["dyn_bias"][f"b{i}"] = lin["b"]
    for layer in range(depth):
        attn_pre = f"{pre}layers.{layer}.0"
        ff_pre = f"{pre}layers.{layer}.1"
        p["layers"].append({
            "attn": {
                "norm": _norm(sd, f"{attn_pre}.norm"),
                "qkv": _linear(sd, f"{attn_pre}.to_qkv", bias=False),
                "out": _linear(sd, f"{attn_pre}.to_out", bias=False),
            },
            "ff": {
                "norm": _norm(sd, f"{ff_pre}.0"),
                "w1": _linear(sd, f"{ff_pre}.1", bias=False),
                "w2": _linear(sd, f"{ff_pre}.4", bias=False),
            },
        })
    return p


def convert_up_trans_v1(sd: dict, depth: int, rate: int) -> dict:
    """Torch ``UpTransV1`` (``l3ac/local_trans.py:97-111``) state dict ->
    ``models.local_transformer.up_trans_v1_apply`` params. Keys:
    ``compressed_tokens.{i}`` (rate-1 learned (1,1,C) tokens) + ``trans.*``."""
    tokens = np.stack([np.asarray(sd[f"compressed_tokens.{i}"]).reshape(-1)
                       for i in range(rate - 1)])
    return {"tokens": tokens, "trans": _local_trans(sd, "trans", depth)}


def convert_en_encoder(sd: dict, mc: ModelConfig) -> dict:
    if not mc.uses_compressed_transformer:
        # plain LocalEncoder(depth=1) (l3ac/en_codec.py:27-29)
        return _local_trans(sd, "local_trans", 1)
    return {
        "down_trans": _local_trans(sd, "down_trans.trans", 1),
        "down_conv": _conv(sd, "down_trans.down_layer"),
        "post_trans": _local_trans(sd, "local_trans", 2),
    }


def convert_en_decoder(sd: dict, mc: ModelConfig) -> dict:
    if not mc.uses_compressed_transformer:
        return _local_trans(sd, "local_trans", mc.en_coder_depth)
    return {
        "pre_trans": _local_trans(sd, "local_trans", mc.en_coder_depth - 2),
        "up_trans": _local_trans(sd, "up_trans.trans", 2),
    }


MODULE_CONVERTERS = {
    "encoder": convert_encoder,
    "quantizer": convert_quantizer,
    "decoder": convert_decoder,
    "en_encoder": convert_en_encoder,
    "en_decoder": convert_en_decoder,
}


class _TrackedStateDict:
    """Read-only state-dict view that records which keys the converter
    consumed, so strict mode can diff against the checkpoint's full key set.
    ``in`` checks do not count as consumption (they probe optional layers)."""

    def __init__(self, sd: dict):
        self._sd = sd
        self.consumed: set[str] = set()

    def __getitem__(self, key: str):
        value = self._sd[key]            # KeyError propagates with the key name
        self.consumed.add(key)
        return value

    def __contains__(self, key: str) -> bool:
        return key in self._sd


def convert_checkpoint(state_dicts: dict, mc: ModelConfig, *,
                       strict: bool = False) -> dict:
    """``{module_name: torch_state_dict}`` -> full codec param pytree.

    With ``strict=True`` the conversion fails loudly on any mismatch between
    the checkpoint and this framework's layer map — a missing key raises with
    the exact torch key name, and keys present in the checkpoint but never
    consumed by the converter are reported per module. This is the guard for
    validating against REAL released checkpoints (the transformer key names —
    ``to_qkv``, ``down_trans.down_layer``, ``dynamic_pos_bias.mlp`` — were
    derived from the local torch oracle, not a downloaded ``en_encoder.pt``;
    see README "real-checkpoint acceptance").
    """
    import jax
    import jax.numpy as jnp

    params = {}
    problems: list[str] = []
    for name, sd in state_dicts.items():
        tracked = _TrackedStateDict(sd)
        try:
            params[name] = MODULE_CONVERTERS[name](tracked, mc)
        except KeyError as e:
            raise KeyError(
                f"converter for module '{name}' expected state-dict key {e} "
                f"which is absent; checkpoint has {len(sd)} keys, e.g. "
                f"{sorted(sd)[:5]}") from e
        unconsumed = sorted(set(sd) - tracked.consumed)
        if unconsumed:
            problems.append(
                f"{name}: {len(unconsumed)}/{len(sd)} keys not consumed: "
                + ", ".join(unconsumed[:12])
                + (" ..." if len(unconsumed) > 12 else ""))
    if strict and problems:
        raise ValueError(
            "strict checkpoint conversion found unconsumed keys (the torch "
            "module tree and this converter disagree):\n  "
            + "\n  ".join(problems))
    return jax.tree.map(jnp.asarray, params)


def load_key_manifest(config_name: str) -> dict | None:
    """Load ``configs/<name>.keys.json`` — the per-module expected state-dict
    key/shape table generated from the torch oracle
    (``tools/gen_key_manifests.py``). None if no manifest ships for the name."""
    import json
    from pathlib import Path

    path = (Path(__file__).resolve().parent.parent / "configs"
            / f"{config_name}.keys.json")
    if not path.exists():
        return None
    return json.loads(path.read_text())


def validate_manifest(state_dicts: dict, manifest: dict) -> list[str]:
    """Diff ``{module: {key: array}}`` against a key manifest. Returns a list
    of human-readable problems (missing keys, unexpected keys, shape
    mismatches) — empty when the checkpoint matches the oracle-derived layout
    exactly. This is the offline half of real-checkpoint acceptance: when a
    real download disagrees with the local oracle's architecture, the diff
    names every divergent key instead of failing deep inside the converter."""
    problems: list[str] = []
    for mod, want in manifest.items():
        if mod not in state_dicts:
            problems.append(f"{mod}: module state dict missing")
            continue
        got = state_dicts[mod]
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        if missing:
            problems.append(f"{mod}: missing keys: " + ", ".join(missing[:8])
                            + (" ..." if len(missing) > 8 else ""))
        if extra:
            problems.append(f"{mod}: unexpected keys: " + ", ".join(extra[:8])
                            + (" ..." if len(extra) > 8 else ""))
        for k in set(want) & set(got):
            if list(np.shape(got[k])) != list(want[k]):
                problems.append(
                    f"{mod}.{k}: shape {list(np.shape(got[k]))} != "
                    f"manifest {list(want[k])}")
    return problems


def convert_model_dir(model_path, mc: ModelConfig, *, strict: bool = True,
                      config_name: str | None = None) -> dict:
    """Load the reference's 5 per-module .pt files from a directory.

    Strict by default: real released checkpoints must convert with every key
    accounted for (weight-norm pairs fold into one dense weight each). When
    ``config_name`` names a shipped manifest, the checkpoint's key/shape sets
    are diffed against it FIRST, so architecture disagreements surface as a
    complete named diff rather than a converter KeyError.
    """
    from pathlib import Path

    model_path = Path(model_path)
    sds = {name: load_torch_state_dict(model_path / f"{name}.pt")
           for name in MODULE_CONVERTERS}
    if config_name is not None:
        manifest = load_key_manifest(config_name)
        if manifest is not None:
            problems = validate_manifest(sds, manifest)
            if strict and problems:
                raise ValueError(
                    f"checkpoint at {model_path} does not match the "
                    f"'{config_name}' key manifest:\n  " + "\n  ".join(problems))
    return convert_checkpoint(sds, mc, strict=strict)
