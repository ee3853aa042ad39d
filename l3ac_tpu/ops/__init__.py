"""Core TPU-native ops: conv, norms, activations, pooling, resampling, FSQ, attention.

All ops operate on channels-last layouts ``(B, T, C)`` — the channel dimension maps
onto TPU lanes (128-wide), which keeps the MXU/VPU tiling natural for the released
L3AC geometries (feature_dim=128).
"""

from .activations import snake, gelu, geglu, silu
from .conv import conv1d, conv1d_strided_matmul, fold_weight_norm
from .norms import channel_norm, layer_norm, grn, instance_norm
from .pool import trend_pool
from .resample import upsample_linear
from . import fsq
from . import attention

__all__ = [
    "snake",
    "gelu",
    "geglu",
    "silu",
    "conv1d",
    "conv1d_strided_matmul",
    "fold_weight_norm",
    "channel_norm",
    "layer_norm",
    "grn",
    "instance_norm",
    "trend_pool",
    "upsample_linear",
    "fsq",
    "attention",
]
