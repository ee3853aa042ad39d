"""l3ac_tpu — a TPU-native neural audio codec framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of zhai-lw/L3AC, designed TPU-first:
channels-last layouts mapped to lanes, MXU-lowered convolutions, block-local
attention kernels, FSQ quantization, and mesh-sharded execution.
"""

from . import config, models, ops, runtime, utils  # noqa: F401
from .config import CodecConfig, ModelConfig, VQConfig, get_config, list_models  # noqa: F401

__version__ = "0.1.0"
