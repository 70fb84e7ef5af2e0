"""Multi-host (multi-process) mesh: 2 CPU processes × 4 virtual devices
form one global 8-device mesh and a cross-process psum returns the global
sum on every process.

This exercises parallel.mesh.maybe_init_distributed end-to-end — the
env-driven jax.distributed.initialize hook plus gloo CPU collectives —
which EXCEEDS reference parity (the reference was single-node NCCL only,
/root/reference/caffe/src/caffe/parallel.cpp:125-137; its uid rendezvous
rode fork, no network path existed). The per-process data feeding uses
jax.make_array_from_process_local_data, the multi-controller analog of
train_loop's shard_batch.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os
import numpy as np
import jax
# the axon site package overrides JAX_PLATFORMS; config wins over it
jax.config.update("jax_platforms", "cpu")

from smallhardface_tpu.parallel import mesh as pm

m = pm.make_mesh()
assert m.devices.size == 8, f"global mesh has {m.devices.size} devices"
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

pid = jax.process_index()
# each process contributes its own 4 local shards, value = pid + 1
local = np.full((4, 2), float(pid + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(m, P(pm.DATA_AXIS)), local)

f = jax.jit(shard_map(
    lambda v: jax.lax.psum(v, pm.DATA_AXIS),
    mesh=m, in_specs=P(pm.DATA_AXIS), out_specs=P()))
out = f(arr)
got = np.asarray(out.addressable_shards[0].data)
# sum over 8 shards: 4 shards of 1.0 + 4 shards of 2.0 = 12
np.testing.assert_allclose(got, 12.0)
print(f"CHILD_OK {pid}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_psum(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0 and f"CHILD_OK {pid}" in out, (
            f"process {pid} rc={rc}\nstdout:\n{out[-2000:]}\n"
            f"stderr:\n{err[-2000:]}")
