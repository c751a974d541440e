"""Torch-free batched data loader with multiprocess workers.

Replaces torch.utils.data.DataLoader + collate_kitti
(reference: datasets/loader/build_loader.py:23-57,
torchie/parallel/collate.py:90-160). Because the pipeline's Reformat stage
already pads every example to fixed shapes, collation is a plain np.stack —
the reference's ragged concat/pad gymnastics disappear.

Workers are fork()ed processes fed index chunks over a task queue, results
returned via a result queue with a bounded prefetch window; order is
preserved. num_workers=0 runs synchronously in-process (tests, debugging).
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Any, Dict, List, Optional

import numpy as np

from det3d_tpu.datasets.loader.sampler import (DistributedGroupSampler,
                                               GroupSampler)


def collate(examples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack fixed-shape example dicts; non-array leaves become lists."""
    out: Dict[str, Any] = {}
    for k in examples[0]:
        vals = [e[k] for e in examples]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) \
                or isinstance(vals[0], (np.integer, np.floating)):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals
    return out


def _worker_loop(dataset, task_q, result_q, seed):
    np.random.seed(seed)
    while True:
        task = task_q.get()
        if task is None:
            break
        batch_id, indices = task
        try:
            examples = [dataset[i] for i in indices]
            result_q.put((batch_id, collate(examples), None))
        except Exception as e:  # surface worker errors to the main process
            import traceback
            result_q.put((batch_id, None, traceback.format_exc()))


class DataLoader:
    def __init__(self, dataset, batch_size=1, sampler=None, shuffle=False,
                 num_workers=0, drop_last=True, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        if sampler is None:
            sampler = GroupSampler(dataset, batch_size, seed=seed) \
                if shuffle else None
        self.sampler = sampler

    def set_epoch(self, epoch):
        self.epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _index_batches(self):
        if self.sampler is not None:
            indices = list(iter(self.sampler))
        else:
            indices = list(range(len(self.dataset)))
        nb = len(indices) // self.batch_size
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        if not self.drop_last and nb * self.batch_size < len(indices):
            batches.append(indices[nb * self.batch_size:])
        return batches

    def __len__(self):
        return len(self._index_batches())

    def _ensure_workers(self):
        """Persistent fork workers: spawned once, fed tasks each epoch.
        Respawning per epoch costs ~0.5 s of first-batch latency, which
        dominates short epochs and stalls the device between epochs."""
        if getattr(self, "_workers", None):
            return
        ctx = mp.get_context("fork")
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue(maxsize=max(4, self.num_workers * 2))
        self._workers = []
        for w in range(self.num_workers):
            p = ctx.Process(
                target=_worker_loop,
                args=(self.dataset, self._task_q, self._result_q,
                      self.seed * 1000 + w),
                daemon=True)
            p.start()
            self._workers.append(p)

    def close(self):
        for p in getattr(self, "_workers", []) or []:
            p.terminate()
        self._workers = []

    def __iter__(self):
        batches = self._index_batches()
        if self.num_workers == 0:
            for idxs in batches:
                yield collate([self.dataset[i] for i in idxs])
            return

        self._ensure_workers()
        # epoch-scoped batch ids so stale results (from an interrupted
        # previous epoch) are recognized and dropped
        base = self.epoch * 1_000_000
        for bid, idxs in enumerate(batches):
            self._task_q.put((base + bid, idxs))
        pending: Dict[int, Any] = {}
        next_id = base
        received = 0
        while received < len(batches):
            bid, batch, err = self._result_q.get()
            if err is not None:
                raise RuntimeError(f"dataloader worker failed:\n{err}")
            if bid < base:
                continue                      # stale from a prior epoch
            received += 1
            pending[bid] = batch
            while next_id in pending:
                yield pending.pop(next_id)
                next_id += 1


def build_dataloader(dataset, batch_size, workers_per_gpu=0, dist=False,
                     shuffle=True, seed=0, **kwargs):
    """Parity: datasets/loader/build_loader.py:23-57. ``dist`` shards the
    epoch across JAX processes (multi-host); single-host keeps everything
    and lets the mesh split the batch."""
    sampler: Optional[object] = None
    if shuffle:
        if dist:
            import jax
            sampler = DistributedGroupSampler(
                dataset, batch_size, num_replicas=jax.process_count(),
                rank=jax.process_index(), seed=seed)
        else:
            sampler = GroupSampler(dataset, batch_size, seed=seed)
    return DataLoader(dataset, batch_size, sampler=sampler,
                      num_workers=workers_per_gpu, seed=seed)
