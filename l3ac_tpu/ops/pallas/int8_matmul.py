"""Fused int8 weight-only dequant-matmul (north-star capability,
BASELINE.json; VERDICT r1 item 8).

``y = x @ (w_q * scale) + b`` with the weight resident at 1 byte/param.
Why a kernel: XLA does not fuse elementwise producers into ``dot`` operands —
the jnp path (``ops.quantized.int8_linear``) materializes a dequantized bf16
copy of the weight in HBM every call, so it reads int8 + writes bf16 + reads
bf16 (2.5 bytes/param more traffic than dense bf16, not less). Here the int8
tile is dequantized in VMEM registers right before the MXU dot; HBM sees only
the 1-byte weights — the point of weight-only quantization at small batch,
where weight streaming dominates the matmul's HBM traffic.

Serves the codec's matmul family (ConvUnit pw1/pw2, transformer qkv/out/ff —
reference ``l3ac/modules.py:32-41``, ``local_trans.py``): K, N <= ~700, so the
whole int8 weight fits VMEM; the grid tiles only the long M = B*T axis.

MEASURED (BENCH_NOTES.md round 3): at L3AC's weight sizes (<= 2 MB/matmul)
the weight-streaming argument does NOT hold on v5e — weights stay resident
across scan iterations and every geometry is activation/compute-bound, so
int8 is 0.1-0.9x the dense bf16 speed. The capability's value here is 2x
checkpoint/host memory, not speed; the bandwidth argument applies to models
with >= 100 MB matmul weights, which this codec is not.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, s_ref, b_ref, o_ref):
    w = (wq_ref[:].astype(jnp.float32) * s_ref[:].astype(jnp.float32)
         ).astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                b: jnp.ndarray | None = None, *,
                interpret: bool = False) -> jnp.ndarray:
    """x: (..., K) bf16/f32; w_q: (K, N) int8; scale: (1, N) or (N,) f32;
    b: (N,) or None. Returns (..., N) in x.dtype."""
    *lead, K = x.shape
    N = w_q.shape[1]
    M = math.prod(lead) if lead else 1
    x2 = x.reshape(M, K)

    TM = 256
    Mp = pl.cdiv(M, TM) * TM
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    bias = b if b is not None else jnp.zeros((N,), x.dtype)

    out = pl.pallas_call(
        _kernel,
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        interpret=interpret,
    )(x2, w_q, scale.reshape(1, N), bias.reshape(1, N).astype(x.dtype))
    return out[:M].reshape(*lead, N)
