"""Device mesh + sharding: the single source of truth for distribution.

The reference's entire comm surface is NCCL all-gather over a DDP group
(/root/reference/scripts/utils.py:16-29). Here distribution is expressed as a
1-D (extensible to 2-D) `jax.sharding.Mesh` with a `data` axis: batches are
sharded over `data`, parameters are replicated, and XLA inserts the
all-gathers/psums that the in-batch-negative losses and FLOPS regularizer
imply. The index shards its corpus over the same axis (`index/engine.py`).
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_DIST_INITIALIZED = False


def maybe_init_distributed() -> bool:
    """Multi-process (multi-host) wiring — the analog of the reference's
    `torchrun --nproc_per_node=N` launch (README.md:64-68).

    Env-gated so single-process runs are untouched:
      * OSSMT_COORDINATOR=host:port, OSSMT_NUM_PROCESSES, OSSMT_PROCESS_ID —
        explicit 3-tuple (the torchrun-style launch; see tools/launch_dist.py)
      * OSSMT_DIST=auto — jax.distributed.initialize() auto-detection
        (SLURM / TPU pod metadata)

    After initialization jax.devices() is the GLOBAL device list, so
    make_mesh() builds the global mesh; each process feeds its local batch
    shard through make_array_from_process_local_data (trainer._place).
    Returns True when running multi-process. Idempotent.
    """
    global _DIST_INITIALIZED
    import os

    if _DIST_INITIALIZED:
        return jax.process_count() > 1
    coord = os.environ.get("OSSMT_COORDINATOR")
    auto = os.environ.get("OSSMT_DIST") == "auto"
    if not coord and not auto:
        return False
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["OSSMT_NUM_PROCESSES"]),
            process_id=int(os.environ["OSSMT_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    _DIST_INITIALIZED = True
    return jax.process_count() > 1


@dataclass(frozen=True)
class MeshConfig:
    dp_size: int = -1  # -1 = all local devices


def make_mesh(dp_size: int = -1, devices=None) -> Mesh:
    """Build a 1-D data-parallel mesh over ICI.

    All model sizes in this workload (23M-167M BERT) fit on one chip, so the
    mesh has a single `data` axis; corpus/index sharding rides the same axis.
    """
    if devices is None:
        devices = jax.devices()
    if dp_size == -1:
        dp_size = len(devices)
    if dp_size > len(devices):
        raise ValueError(f"dp_size {dp_size} > available devices {len(devices)}")
    mesh_devices = np.asarray(devices[:dp_size])
    return Mesh(mesh_devices, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh with the leading dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    with mesh:
        yield mesh


_GLOBAL_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Mesh):
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Mesh:
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = make_mesh()
    return _GLOBAL_MESH
