"""Multi-host object gather for evaluation.

Parity: reference torchie/trainer/utils.py:114-154 ``all_gather`` — pickle
per-rank python objects, pad byte tensors to the max length, collective
gather, unpickle on every host. Here the collective is
``multihost_utils.process_allgather`` over the JAX global runtime instead
of torch.distributed.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np

import jax


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object per process; returns list over ranks."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    local_len = np.array([data.shape[0]], np.int64)
    lens = np.asarray(multihost_utils.process_allgather(local_len)).reshape(-1)
    max_len = int(lens.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[:data.shape[0]] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)
    return [pickle.loads(gathered[r, :int(lens[r])].tobytes())
            for r in range(jax.process_count())]


def get_dist_info():
    """(rank, world_size) of this host process. Parity:
    torchie/trainer/utils.py:22-33 — process-level (one JAX process may
    drive several chips; device-level reduction lives inside jit)."""
    return jax.process_index(), jax.process_count()


def master_only(func):
    """Decorator: run only on process 0 (torchie/trainer/utils.py:36-47)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if jax.process_index() == 0:
            return func(*args, **kwargs)
        return None

    return wrapper


def synchronize():
    """Cross-process barrier (torchie/trainer/utils.py:99-111). JAX has no
    bare barrier primitive; a 1-element allgather is one."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.process_allgather(np.zeros((1,), np.int32))


def reduce_dict(d: dict, average: bool = True) -> dict:
    """Mean (or sum) of scalar dict values across processes
    (torchie/trainer/utils.py:157-183). Values may be python floats or
    0-d arrays; returns python floats."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in d.items()}
    from jax.experimental import multihost_utils

    keys = sorted(d)
    vec = np.asarray([float(d[k]) for k in keys], np.float64)
    allv = np.asarray(multihost_utils.process_allgather(vec))
    allv = allv.reshape(jax.process_count(), len(keys))
    red = allv.mean(axis=0) if average else allv.sum(axis=0)
    return dict(zip(keys, red.tolist()))
