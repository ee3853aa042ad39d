"""INT8 weight-only quantization: exactness of the machinery + end-to-end
accuracy on the codec."""

import numpy as np

import jax
import jax.numpy as jnp

from l3ac_tpu.config import get_config
from l3ac_tpu.models import codec as fcodec
from l3ac_tpu.ops import quantized

RNG = np.random.default_rng(17)


def test_quantize_dequantize_error_bound():
    w = jnp.asarray(RNG.standard_normal((128, 512)).astype(np.float32)) * 0.05
    w_q, scale = quantized.quantize_weight(w)
    w_d = quantized.dequantize_weight(w_q, scale, dtype=jnp.float32)
    # max error is half an int8 step per channel
    step = np.asarray(scale)[0]
    assert float(jnp.max(jnp.abs(w - w_d))) <= float(step.max()) * 0.5 + 1e-7


def test_int8_linear_matches_dequant_matmul():
    x = jnp.asarray(RNG.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((64, 32)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((32,)).astype(np.float32))
    w_q, scale = quantized.quantize_weight(w)
    got = quantized.int8_linear(x, w_q, scale, b)
    want = x @ quantized.dequantize_weight(w_q, scale, jnp.float32) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_codec_forward_with_quantized_params():
    """quantize_params swaps matmul weights to int8; forward still runs and
    stays close to the fp32 output."""
    mc = get_config("debug").network_config
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc)
    audio = jnp.asarray((RNG.standard_normal((2, mc.hop_length * 8)) * 0.3)
                        .astype(np.float32))

    ref = fcodec.forward(params, audio, mc)["generated_audio"]

    qparams = quantized.quantize_params(params)
    n_q = len([1 for p in jax.tree.leaves(
        jax.tree.map(lambda x: x.dtype == jnp.int8, qparams)) if p])
    assert n_q > 0, "no weights were quantized"
    out = fcodec.forward(qparams, audio, mc)["generated_audio"]
    err = float(jnp.max(jnp.abs(out - ref)))
    # int8 weight-only on a tanh-bounded decoder: small but nonzero deviation
    assert err < 0.1, err
