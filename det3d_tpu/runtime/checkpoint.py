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


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_weights_npz(state, path: str) -> None:
    """Portable weights-only export: params + batch_stats as one .npz with
    '/'-joined keys. The publishable-artifact analogue of the reference's
    model-zoo .pth files (torchie/trainer/checkpoint.py:176-215) — load
    anywhere with ``load_weights(state, path_or_url)``."""
    flat = {f"params/{k}": v
            for k, v in _flatten(state.params).items()}
    flat.update({f"batch_stats/{k}": v
                 for k, v in _flatten(state.batch_stats).items()})
    with open(path, "wb") as f:
        np.savez(f, **flat)


def _fetch_url(url: str) -> str:
    """Download a remote weights file to the local cache (once)."""
    import hashlib
    import urllib.request

    cache = os.path.join(os.path.expanduser("~"), ".cache", "det3d_tpu")
    os.makedirs(cache, exist_ok=True)
    name = (hashlib.sha1(url.encode()).hexdigest()[:16] + "_"
            + os.path.basename(url.split("?")[0]))
    dst = os.path.join(cache, name)
    if not os.path.exists(dst):
        tmp = dst + ".part"
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dst)
    return dst


def load_weights(state, src: str, epoch: Optional[int] = None):
    """Weights-only load for finetune (reference cfg.load_from semantics,
    apis/train.py:320-323): params + batch_stats, optimizer state
    untouched.

    ``src`` dispatches like the reference's load_checkpoint
    (torchie/trainer/checkpoint.py:121-174 — filepath / URL / zoo):
      * http(s):// or file:// URL of an .npz  -> downloaded to
        ~/.cache/det3d_tpu once, then loaded;
      * a local .npz (from ``save_weights_npz``);
      * an orbax checkpoint work dir (the default local form).
    """
    if src.startswith(("http://", "https://", "file://")):
        src = _fetch_url(src)
    if os.path.isfile(src):
        with np.load(src) as z:
            flat = {k: z[k] for k in z.files}

        def fill(template, section):
            def one(path, t):
                key = section + "/" + "/".join(
                    str(getattr(p, "key", p)) for p in path)
                if key not in flat:
                    raise KeyError(f"weights file {src} missing {key}")
                return np.asarray(flat[key], t.dtype)
            return jax.tree_util.tree_map_with_path(one, template)

        return state.replace(
            params=fill(state.params, "params"),
            batch_stats=fill(state.batch_stats, "batch_stats"))
    mgr = CheckpointManager(src)
    restored, _ = mgr.restore(state, epoch)
    out = state.replace(params=restored.params,
                        batch_stats=restored.batch_stats)
    mgr.close()
    return out
