"""Device mesh helpers.

The reference's entire distributed stack (NCCL process groups, DDP gradient
allreduce, DistOptimizerHook, two SyncBN implementations, pickled all_gather
— SURVEY.md section 2.6) collapses on TPU into: one ``jax.sharding.Mesh``
with a ``data`` axis, batch arrays sharded on that axis, and jit's global-
program semantics. Gradients and BatchNorm statistics are global reductions
in the traced program, so XLA inserts the ICI collectives automatically —
there is no DDP wrapper, no explicit allreduce and no SyncBN special case.

Multi-host: call :func:`initialize_distributed` first (maps to
``jax.distributed.initialize``; the reference's torch.distributed env:// /
slurm launchpath — torchie/apis/env.py:13-52 — is subsumed by JAX runtime
bring-up).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def get_dist_info():
    """(rank, world_size) — parity shim for torchie/trainer/utils.py:22."""
    return jax.process_index(), jax.process_count()
