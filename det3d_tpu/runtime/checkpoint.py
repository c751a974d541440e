"""Orbax checkpointing of the train state + metadata.

Parity surface: reference det3d/torchie/trainer/checkpoint.py:121-215
(save_checkpoint with meta {epoch, iter, config text, CLASSES}, latest
pointer, load with partial/strict modes). TPU design: the train state is a
pytree (params / batch_stats / opt_state / step); orbax handles atomic
multi-host writes; `latest` resolution is orbax's step tracking.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _meta_path(directory: str) -> str:
    return os.path.join(directory, "det3d_tpu_meta.json")


class CheckpointManager:
    """Epoch-indexed checkpoint manager over a work dir."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state: Any, meta: Optional[Dict] = None) -> None:
        """Save state under the epoch index; meta mirrors the reference's
        checkpoint meta dict (tools/train.py:127-132)."""
        self._mgr.save(epoch, args=ocp.args.StandardSave(
            jax.tree.map(np.asarray, _strip_static(state))))
        self._mgr.wait_until_finished()
        if meta is not None:
            with open(_meta_path(self.directory), "w") as f:
                json.dump({**meta, "epoch": epoch}, f)

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, epoch: Optional[int] = None):
        """Restore into the template's structure (shapes/dtypes preserved)."""
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        tpl = jax.tree.map(np.asarray, _strip_static(state_template))
        restored = self._mgr.restore(epoch, args=ocp.args.StandardRestore(tpl))
        return _merge_static(state_template, restored), epoch

    def load_meta(self) -> Optional[Dict]:
        p = _meta_path(self.directory)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def close(self):
        self._mgr.close()


def _strip_static(state):
    """Drop non-array static fields (e.g. the optax transformation)."""
    if hasattr(state, "params"):  # TrainState
        return {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
    return state


def _merge_static(template, restored):
    if hasattr(template, "params"):
        return template.replace(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=jax.tree.map(
                lambda _, r: r, template.opt_state, restored["opt_state"]))
    return restored


def load_weights(state, directory: str, epoch: Optional[int] = None):
    """Weights-only load for finetune (reference cfg.load_from semantics,
    apis/train.py:320-323): params + batch_stats, optimizer state untouched."""
    mgr = CheckpointManager(directory)
    restored, _ = mgr.restore(state, epoch)
    out = state.replace(params=restored.params,
                        batch_stats=restored.batch_stats)
    mgr.close()
    return out
