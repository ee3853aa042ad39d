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
           for s in (0.31, 0.17, 0.52)]

server = CodecServer({"debug": model}, chunk_seconds=CHUNK_SECONDS,
                     batch_size=1, mesh=mesh, use_native=False)
assert server.rows_per_step == 2 * n
handles = [server.submit("debug", a) for a in streams]
server.drain()
toks = [server.tokens(h) for h in handles]

seq = StreamCodec(model, chunk_seconds=CHUNK_SECONDS, batch_size=1)
for t, a in zip(toks, streams):
    want = seq.encode_streams([a], use_native=False)[0]
    np.testing.assert_array_equal(t, want)

dec = [server.submit_decode("debug", indices=t, length=len(a))
       for t, a in zip(toks, streams)]
server.drain()
outs = [server.audio(h) for h in dec]
want_audio = seq.decode_indices_streams(toks, lengths=[len(a)
                                                       for a in streams])
for got, want in zip(outs, want_audio):
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)

D.barrier("mp-test-end")
print(f"MP_OK {pid} procs={jax.process_count()} devices={jax.device_count()}",
      flush=True)
