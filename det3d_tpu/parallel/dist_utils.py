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
