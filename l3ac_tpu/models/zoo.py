"""User-facing model zoo and codec facade.

Mirrors the reference API surface (``l3ac/__init__.py``): ``list_models()``,
``get_model(name)``, ``get_model_info(...)``, and an ``L3AC`` facade with
``encode_audio`` / ``decode_audio`` / ``load_pretrained``.

TPU specifics: calls are jit-compiled per (batch, padded-length) bucket; audio
lengths are right-padded to the model hop and bucketed to limit recompilation.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig, get_config, list_models  # noqa: F401
from ..runtime import convert
from ..runtime.chunk import ChunkData
from . import codec as fcodec

log = logging.getLogger("l3ac_tpu")


class L3AC:
    """Stateful convenience wrapper around the functional codec."""

    def __init__(self, config: CodecConfig, params=None, *, seed: int = 0,
                 dtype=jnp.float32):
        self.config = config
        self.mc = config.network_config
        self.dtype = dtype
        if params is None:
            params = fcodec.init_codec(jax.random.PRNGKey(seed), self.mc, dtype)
        # inference fast path: precompute the DynamicPositionBias matrices
        # (bit-identical to the in-forward build; ~6 ms/step on the 1kbps
        # flagship otherwise — see lt.attach_bias_cache)
        self.params = fcodec.attach_bias_caches(params, self.mc)

        mc = self.mc
        self._encode = jax.jit(partial(fcodec.encode, mc=mc))
        self._decode = jax.jit(partial(fcodec.decode, mc=mc))
        self._decode_indices = jax.jit(partial(fcodec.decode_indices, mc=mc))

    # -- weights ----------------------------------------------------------
    def load_pretrained(self, model_path: str | Path | None = None):
        """Load + convert the reference's per-module torch checkpoints.

        Downloads from the HF template URL when missing (reference
        ``l3ac/__init__.py:90-106``); conversion folds weight norm.
        """
        path = Path(model_path) if model_path else self.config.model_path
        if not path.exists() or not (path / "encoder.pt").exists():
            self.download_weights(path)
        self.params = fcodec.attach_bias_caches(convert.convert_model_dir(
            path, self.mc, config_name=self.config.model_name), self.mc)
        return self

    def download_weights(self, path: Path):
        import urllib.request

        path.mkdir(parents=True, exist_ok=True)
        for module in ("encoder", "quantizer", "decoder", "en_encoder",
                       "en_decoder"):
            target = path / f"{module}.pt"
            if target.exists():
                log.info("%s already exists, skip download", target)
                continue
            url = self.config.resolved_weight_url.format(module)
            log.warning("Downloading %s -> %s", url, target)
            try:
                urllib.request.urlretrieve(url, target)
            except Exception as e:
                target.unlink(missing_ok=True)  # drop any partial file
                raise RuntimeError(
                    f"failed to download {url} -> {target}: {e}; check network "
                    "access or place the per-module .pt checkpoints under "
                    f"{path} manually") from e

    # -- inference --------------------------------------------------------
    def preprocess(self, audio) -> tuple[jnp.ndarray, int]:
        audio = jnp.asarray(audio, self.dtype)
        if audio.ndim == 1:
            audio = audio[None]
        return fcodec.preprocess(audio, self.mc)

    def encode_audio(self, audio):
        """(B, T) audio -> (q_trans_feature, indices). Reference
        ``L3AC.encode_audio`` (``l3ac/__init__.py:108-114``)."""
        padded, _ = self.preprocess(audio)
        return self._encode(self.params, padded)

    def decode_audio(self, audio_feature=None, indices=None,
                     audio_length: int | None = None):
        """Features or indices -> (B, T) audio. Reference ``L3AC.decode_audio``."""
        if audio_feature is not None:
            out = self._decode(self.params, jnp.asarray(audio_feature, self.dtype))
        else:
            out = self._decode_indices(self.params, jnp.asarray(indices))
        if audio_length is not None:
            out = out[..., :audio_length]
        return out

    def roundtrip(self, audio):
        """encode+decode with length restoration — the README-demo acceptance path."""
        audio = jnp.asarray(audio, self.dtype)
        if audio.ndim == 1:
            audio = audio[None]
        length = audio.shape[-1]
        q, _ = self.encode_audio(audio)
        return self.decode_audio(audio_feature=q, audio_length=length)

    # -- chunked streaming (reference extract_unit/decode_unit) -----------
    def extract_unit(self, audio, process_window: int = 5 * 16000):
        """Batch-1 chunked encode (reference ``l3ac/codec.py:124-147``)."""
        audio = np.asarray(audio, np.float32)
        assert audio.shape[0] == 1, "Only support batch size 1"
        padded, _ = self.preprocess(audio)
        padded = np.asarray(padded)
        hop = self.mc.hop_length
        window = process_window // hop * hop

        chunk_audio = ChunkData(chunk_len=window, prefix_len=hop,
                                original_data=padded[0])
        idx_chunks, feat_chunks = [], []
        for x in chunk_audio.chunk_data:
            q, idx = self._encode(self.params, jnp.asarray(x)[None])
            idx_chunks.append(np.asarray(idx[0]))
            feat_chunks.append(np.asarray(q[0]))
        return (ChunkData(chunk_len=window // hop, prefix_len=1,
                          chunk_data=idx_chunks),
                ChunkData(chunk_len=window // hop, prefix_len=1,
                          chunk_data=feat_chunks))

    def decode_unit(self, chunk_indices=None, chunk_q_feature=None):
        """Batch-1 chunked decode (reference ``l3ac/codec.py:149-156``)."""
        hop = self.mc.hop_length
        if chunk_q_feature is not None:
            chunks = [np.asarray(self._decode(
                self.params, jnp.asarray(x)[None])[0])
                for x in chunk_q_feature.chunk_data]
        else:
            chunks = [np.asarray(self._decode_indices(
                self.params, jnp.asarray(x)[None])[0])
                for x in chunk_indices.chunk_data]
        out = ChunkData(chunk_len=len(chunks[0]), prefix_len=hop,
                        chunk_data=chunks)
        return out.data[None]


def get_model(name: str, *, pretrained: bool = True, dtype=jnp.float32,
              **overrides) -> L3AC:
    """Build a named model; downloads + converts reference weights when
    ``pretrained`` (requires network access).

    ``dtype``: parameter/compute dtype. ``jnp.bfloat16`` is the production
    serving dtype (matches bench.py's flagship numbers; fp32 runs the MXU at
    a fraction of its bf16 rate). Pretrained fp32 weights are cast after
    conversion; index agreement bounds for bf16 are pinned in tests/test_bf16.
    """
    cfg = get_config(name, **overrides)
    model = L3AC(cfg, dtype=dtype)
    if pretrained:
        model.load_pretrained()
        if dtype != jnp.float32:
            model.params = jax.tree.map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, model.params)
    return model


def get_model_info(model: L3AC, eval_flops_seconds: int = 10) -> dict:
    """Model-card numbers (reference ``get_model_info``, ``l3ac/__init__.py:28-51``).

    MACs come from XLA's compiled cost analysis of the full forward over
    ``eval_flops_seconds`` of audio (the reference uses ptflops for the same
    number); best-effort — some backends don't report flops.
    """
    cfg = model.config
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(model.params))
    info = {
        "params": n_params,
        "codebook_size": cfg.network_config.vq.codebook_size,
        "frame_rate": cfg.frame_rate,
        "bps": cfg.bps,
        "receptive_field": cfg.receptive_field_seconds,
    }
    try:
        mc = model.mc
        T = eval_flops_seconds * cfg.sample_rate // mc.hop_length * mc.hop_length
        lowered = jax.jit(partial(fcodec.forward, mc=mc)).lower(
            model.params, jnp.zeros((1, T), model.dtype))
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops") if cost else None
        if flops:
            info["macs"] = int(flops / 2)
            info["macs_per_audio_second"] = int(flops / 2 / eval_flops_seconds)
    except Exception:  # pragma: no cover - backend-dependent
        pass
    return info
