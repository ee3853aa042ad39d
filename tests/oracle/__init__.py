"""Golden-oracle access to the torch reference at /root/reference.

The reference's package-level import pulls in ``pydantic_settings`` (absent in
this environment); a minimal shim is installed so that the *model* modules
(pure torch) import cleanly. Nothing from the reference is executed beyond the
model math under test.
"""

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _install_pydantic_settings_shim():
    if "pydantic_settings" in sys.modules:
        return
    import pydantic

    mod = types.ModuleType("pydantic_settings")

    class BaseSettings(pydantic.BaseModel):
        model_config = {}

    class PydanticBaseSettingsSource:  # pragma: no cover - import-time shim only
        def __init__(self, *a, **k):
            pass

    class TomlConfigSettingsSource(PydanticBaseSettingsSource):
        pass

    mod.BaseSettings = BaseSettings
    mod.SettingsConfigDict = dict
    mod.PydanticBaseSettingsSource = PydanticBaseSettingsSource
    mod.TomlConfigSettingsSource = TomlConfigSettingsSource
    sys.modules["pydantic_settings"] = mod


def _install_local_attention_oracle():
    """Register tests.oracle.local_attention_oracle as ``local_attention`` so the
    reference's lazy ``from local_attention.transformer import ...`` resolves to
    our independently written torch replica of the pinned package semantics."""
    if "local_attention" in sys.modules:
        return
    from . import local_attention_oracle

    pkg = types.ModuleType("local_attention")
    pkg.transformer = local_attention_oracle
    sys.modules["local_attention"] = pkg
    sys.modules["local_attention.transformer"] = local_attention_oracle


def import_reference():
    """Import and return the reference ``l3ac`` package (torch, CPU)."""
    _install_pydantic_settings_shim()
    _install_local_attention_oracle()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import l3ac  # noqa: F401
    import l3ac.modules
    import l3ac.layers
    import l3ac.tconv
    import l3ac.vq.fsq
    import l3ac.local_trans
    import l3ac.en_codec
    return l3ac
