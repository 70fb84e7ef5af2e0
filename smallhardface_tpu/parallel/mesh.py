"""Device-mesh construction and sharding helpers.

The reference scaled by forking one Caffe solver process per GPU and fusing
gradients with NCCL allreduce (/root/reference/caffe/src/caffe/parallel.cpp:
125-257). TPU-native, a single process drives a `jax.sharding.Mesh` over the
local devices; the train step is jitted over the mesh with a `shard_map`
whose psum over the 'data' axis plays the allreduce role on ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

DATA_AXIS = "data"


_distributed_initialized = False


def maybe_init_distributed():
    """Initialize multi-host JAX when launched under a pod launcher
    (env-driven, a no-op on single host). Exceeds reference parity — the
    reference was single-node only (SURVEY.md §2.3). After this,
    `jax.devices()` returns the GLOBAL device set, so `make_mesh` builds a
    DCN-spanning mesh and collectives cross processes. train_net feeds a
    multi-process mesh per-controller (each process builds its addressable
    rows via jax.make_array_from_process_local_data) and produces params
    bit-identical to a single-process run — tested by
    tests/test_multihost.py with 2 CPU processes over gloo.
    `shard_batch`/`replicate` device_put full host arrays and remain
    single-controller helpers."""
    import os
    global _distributed_initialized
    if _distributed_initialized:
        return
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # CPU must be detected WITHOUT initializing the backend
        # (jax.default_backend() would; distributed.initialize must run
        # first). Both selection mechanisms count: the env var and
        # jax.config.update("jax_platforms", "cpu") — the documented way
        # to force CPU under the axon site package (CLAUDE.md).
        plat = (os.environ.get("JAX_PLATFORMS") or
                getattr(jax.config, "jax_platforms", None) or "")
        if "cpu" in str(plat):
            # cross-process collectives on the CPU backend go through gloo
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        _distributed_initialized = True


SPATIAL_AXIS = "sp"


def make_mesh(num_devices: int = -1, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D device mesh; num_devices <= 0 means all local devices."""
    maybe_init_distributed()
    devs = jax.devices()
    n = len(devs) if num_devices <= 0 else min(num_devices, len(devs))
    if 0 < len(devs) < num_devices:
        import logging
        logging.getLogger(__name__).warning(
            "Requested %d devices but only %d available (%s backend); "
            "using %d", num_devices, len(devs), devs[0].platform, n)
    return Mesh(np.array(devs[:n]), (axis_name,))


def make_spatial_mesh(num_devices: int = -1) -> Mesh:
    """Mesh for sharding a single image's spatial H axis across chips.
    XLA's SPMD partitioner inserts the conv halo exchanges automatically,
    so one large image runs across the mesh with bit-identical results —
    the resolution-scaling axis SURVEY.md §5 identifies (the reference had
    no model/spatial parallelism at all)."""
    return make_mesh(num_devices, axis_name=SPATIAL_AXIS)


def make_group_mesh(groups: int, spatial: int) -> Mesh:
    """2-D (DATA_AXIS, SPATIAL_AXIS) mesh: `groups` data-parallel groups
    of `spatial` chips, each group sharding one image's H axis — the
    training analog of eval/serve's TPU.SPATIAL_DEVICES grouping (and the
    scaling-book two-axis recipe: DP over the slower axis, the
    halo-exchange-heavy spatial axis over contiguous devices so its
    ppermutes ride neighbor ICI links)."""
    maybe_init_distributed()
    devs = jax.devices()
    need = groups * spatial
    assert len(devs) >= need, (
        f"group mesh needs {groups}x{spatial}={need} devices, "
        f"have {len(devs)}")
    arr = np.array(devs[:need]).reshape(groups, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_spec() -> P:
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def shard_batch(mesh: Mesh, tree):
    """Place host arrays with a leading device axis onto the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
