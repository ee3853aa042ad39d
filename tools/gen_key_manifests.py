"""Generate per-config checkpoint key manifests (configs/<name>.keys.json).

Each manifest records, per reference module (encoder/quantizer/decoder/
en_encoder/en_decoder — ``l3ac/en_codec.py:46-51``), the exact torch
state-dict key set and tensor shapes the released checkpoint must contain.
The shapes/keys come from the torch oracle (the reference model source +
tests/oracle/local_attention_oracle.py standing in for the pinned
``local-attention==1.11.2`` package), so a future online run against a REAL
downloaded checkpoint diffs instantly: ``runtime.convert.validate_manifest``
reports any missing/unexpected key or shape mismatch before conversion.

Run: python tools/gen_key_manifests.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import torch  # noqa: E402

from tests.oracle import import_reference  # noqa: E402

import_reference()


def build_ref(name: str):
    from l3ac.en_codec import EnCodec, ModelConfig as RefMC

    from l3ac_tpu import get_config

    cfg = get_config(name).network_config
    torch.manual_seed(0)
    ref_mc = RefMC(
        feature_dim=cfg.feature_dim, compress_rates=cfg.compress_rates,
        encoder_dims=cfg.encoder_dims, encoder_depths=cfg.encoder_depths,
        decode_rates=cfg.decode_rates, decoder_dims=cfg.decoder_dims,
        decoder_depths=cfg.decoder_depths, base_unit=cfg.base_unit,
        use_norm=cfg.use_norm, use_snake_act=cfg.use_snake_act,
        decoder_last_layer=cfg.decoder_last_layer,
        vq_config=dict(name="super_fsq", levels=list(cfg.vq.levels),
                       noise_rate=cfg.vq.noise_rate),
        en_coder_depth=cfg.en_coder_depth,
        en_coder_window_size=cfg.en_coder_window_size,
        en_coder_dynamic_pos=cfg.en_coder_dynamic_pos,
        en_coder_compress_rate=cfg.en_coder_compress_rate,
        en_coder_cache_size=cfg.en_coder_cache_size,
    )
    return EnCodec(ref_mc).eval()


def main():
    out_dir = REPO / "l3ac_tpu" / "configs"
    for name in ("0k75bps", "1kbps", "1k5bps", "3kbps", "debug"):
        ref = build_ref(name)
        manifest = {}
        for mod_name, mod in ref.trainable_modules.items():
            manifest[mod_name] = {
                k: list(v.shape) for k, v in sorted(mod.state_dict().items())}
        path = out_dir / f"{name}.keys.json"
        path.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
        n = sum(len(v) for v in manifest.values())
        print(f"{name}: {n} keys -> {path}")


if __name__ == "__main__":
    main()
