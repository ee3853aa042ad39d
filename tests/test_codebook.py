"""Sharded codebook-search capability (generic; FSQ itself needs no search)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from l3ac_tpu.ops import codebook
from l3ac_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(21)


def _brute(q, cb):
    d = ((q[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    return d.argmin(1).astype(np.int32), d.min(1)


def test_nearest_codes_tiled():
    q = RNG.standard_normal((64, 6)).astype(np.float32)
    cb = RNG.standard_normal((1000, 6)).astype(np.float32)
    want_i, want_d = _brute(q, cb)
    got_i, got_d = codebook.nearest_codes(jnp.asarray(q), jnp.asarray(cb),
                                          tile=128)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_nearest_codes():
    mesh = make_mesh(dp=1, sp=1, tp=8)
    q = RNG.standard_normal((32, 6)).astype(np.float32)
    cb = RNG.standard_normal((1024, 6)).astype(np.float32)
    want_i, want_d = _brute(q, cb)

    f = shard_map(
        lambda qq, cc: codebook.sharded_nearest_codes(qq, cc, axis_name="tp",
                                                      tile=64),
        mesh=mesh, in_specs=(P(), P("tp", None)), out_specs=(P(), P()),
        # outputs are replicated by construction (all_gather + argmin), which
        # the varying-mesh-axes checker cannot infer
        check_vma=False)
    got_i, got_d = f(jnp.asarray(q), jnp.asarray(cb))
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-4)
