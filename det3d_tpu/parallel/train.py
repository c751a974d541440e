"""Jitted train / eval steps over a data-parallel mesh.

This is the TPU replacement for the reference's batch_processor + DDP +
OptimizerHook pipeline (reference: torchie/apis/train.py:143
``batch_processor``, torchie/trainer/trainer.py:347 ``batch_processor_inline``,
torchie/trainer/hooks/optimizer.py:6-20, core/utils/dist_utils.py:45
``DistOptimizerHook``). One jitted function voxelizes, assigns targets,
runs the network, computes losses, takes the (globally-reduced) gradient
step and updates BatchNorm statistics — all on device, all static shapes.

Batch layout (host -> device, produced by the data pipeline):
  points:      (B, P, C) float32, padded
  num_points:  (B,)      int32
  gt_boxes:    (B, G, nd) float32, padded
  gt_classes:  (B, G)    int32 (global 1-based ids)
  gt_valid:    (B, G)    bool

Sharding: batch arrays sharded on axis 0 over the ``data`` mesh axis, state
replicated. Because the step is a single global jit program, gradient
reduction and BatchNorm statistics are global automatically (= DDP + SyncBN).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from det3d_tpu.core.target import TargetAssigner
from det3d_tpu.core.voxelize import VoxelGenerator


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)


def build_example(batch: Dict[str, jnp.ndarray],
                  voxel_generator: VoxelGenerator,
                  assigners: Sequence[TargetAssigner],
                  class_ids_per_task: Sequence[Sequence[int]],
                  with_targets: bool = True, rng=None) -> Dict[str, Any]:
    """On-device data plane: voxelize + per-task target assignment.

    Replaces the reference pipeline stages Voxelization + AssignTarget
    (pipelines/preprocess.py:259-483) which ran in CPU worker processes.
    ``rng`` (PRNGKey) is only needed when an assigner uses
    positive_fraction subsampling.
    """
    # point_lin/point_perm: host-precomputed voxel ids and sort order
    # riding along with a host rulebook plan (ops/sparse_host.py) — host
    # and device agree on every point's voxel by construction, and the
    # device's P-row sort becomes one gather (core/voxelize.py overrides).
    # A batch carrying "voxels" was voxelized on the HOST entirely
    # (ops/voxelize_host.py, the serving path — matching the reference's
    # timed contract where CPU voxelization precedes the step): passthrough.
    if "voxels" in batch:
        vox = {"voxels": batch["voxels"],
               "coords": batch["coordinates"],
               "num_points_per_voxel": batch["num_points_per_voxel"],
               "num_voxels": batch["num_voxels"]}
    else:
        vox = voxel_generator.generate_batch(
            batch["points"], batch["num_points"],
            lin=batch.get("point_lin"), perm=batch.get("point_perm"))
    batch_size = batch["points"].shape[0]

    example: Dict[str, Any] = {
        "voxels": vox["voxels"],
        "coordinates": vox["coords"],
        "num_points_per_voxel": vox["num_points_per_voxel"],
        "num_voxels": vox["num_voxels"],
        "anchors": [],
    }
    if with_targets:
        example.update({"labels": [], "reg_targets": [], "reg_weights": []})

    use_amask = any(a.anchor_area_threshold >= 0 for a in assigners)
    if use_amask:
        example["anchors_mask"] = []
        grid = voxel_generator.grid_size

    for t, (assigner, class_ids) in enumerate(
            zip(assigners, class_ids_per_task)):
        anchors = jnp.asarray(assigner.anchors_flat)          # (A, nd)
        example["anchors"].append(
            jnp.broadcast_to(anchors[None], (batch_size, *anchors.shape)))
        amask = None
        if use_amask and assigner.anchor_area_threshold >= 0:
            amask = jax.vmap(
                lambda co: assigner.anchors_mask(co, grid))(vox["coords"])
        if use_amask:
            example["anchors_mask"].append(amask)
        if with_targets:
            assign = functools.partial(assigner.assign,
                                       class_ids=tuple(class_ids))
            kwargs = {}
            if amask is not None:
                kwargs["anchors_mask"] = amask
            if rng is not None and assigner.positive_fraction is not None:
                kwargs["rng"] = jax.random.split(
                    jax.random.fold_in(rng, t), batch_size)
            labels, targets, weights = jax.vmap(assign)(
                batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
                **kwargs)
            example["labels"].append(labels)
            example["reg_targets"].append(targets)
            example["reg_weights"].append(weights)
    return example


def make_train_step(model, voxel_generator: VoxelGenerator,
                    assigners: Sequence[TargetAssigner],
                    class_ids_per_task: Sequence[Sequence[int]],
                    mesh: Optional[Mesh] = None) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics), jitted.

    When ``mesh`` is given, batch inputs are constrained to be sharded on the
    leading axis over 'data' and state replicated; XLA lays gradient psums on
    the ICI.
    """

    needs_rng = any(a.positive_fraction is not None for a in assigners)

    def step_fn(state: TrainState, batch):
        # per-step deterministic key for target subsampling (only built when
        # an assigner uses positive_fraction, to keep other graphs unchanged)
        rng = (jax.random.fold_in(jax.random.PRNGKey(0), state.step)
               if needs_rng else None)
        example = build_example(batch, voxel_generator, assigners,
                                class_ids_per_task, with_targets=True,
                                rng=rng)
        # host-precomputed packed rulebooks (keys "plan_*", added by the
        # HostPlan pipeline stage) go to the sparse middle as one pytree
        plan = {k[5:]: v for k, v in batch.items()
                if k.startswith("plan_")} or None
        kw = {} if plan is None else {"plan": plan}

        def loss_fn(params):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                example["voxels"], example["num_points_per_voxel"],
                example["coordinates"], train=True, mutable=["batch_stats"],
                **kw)
            losses = model.loss(example, preds)
            total = sum(losses["loss"])
            return total, (losses, mutated["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {
            "loss": total,
            "grad_norm": optax.global_norm(grads),
            "num_voxels": jnp.mean(example["num_voxels"].astype(jnp.float32)),
        }
        for k in ("loc_loss_reduced", "cls_loss_reduced", "dir_loss_reduced",
                  "cls_pos_loss", "cls_neg_loss", "num_pos", "num_neg"):
            if k in losses:
                for t, v in enumerate(losses[k]):
                    metrics[f"{k}_task{t}"] = jnp.asarray(v, jnp.float32)
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn,
                       in_shardings=(repl, data),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,))
    return jax.jit(step_fn, donate_argnums=(0,))


def make_predict_step(model, voxel_generator: VoxelGenerator,
                      assigners: Sequence[TargetAssigner],
                      class_ids_per_task: Sequence[Sequence[int]],
                      test_cfg, mesh: Optional[Mesh] = None) -> Callable:
    """Returns predict_step(state, batch) -> padded detections dict.

    Mirrors the eval half of batch_processor (train.py:143) + head predict.
    """

    double_flip = bool(
        test_cfg.get("double_flip", False) if isinstance(test_cfg, dict)
        else getattr(test_cfg, "double_flip", False))

    def step_fn(state: TrainState, batch):
        if double_flip:
            # 4-variant stacked forward [id, y-flip, x-flip, xy-flip];
            # predict_tta de-flips and merges before one NMS. Parity role:
            # reference pipelines/test_aug.py:8 (+ the nuScenes double-flip
            # note at preprocess.py:202-206), fused into the jitted step.
            # (host plans don't apply here: the flips rewrite the points
            # inside the step — eval_detector never injects them with TTA)
            pts = batch["points"]
            p_y = pts.at[..., 1].multiply(-1.0)
            p_x = pts.at[..., 0].multiply(-1.0)
            p_xy = p_x.at[..., 1].multiply(-1.0)
            batch = {
                "points": jnp.concatenate([pts, p_y, p_x, p_xy], axis=0),
                "num_points": jnp.tile(batch["num_points"], (4,)),
            }
        example = build_example(batch, voxel_generator, assigners,
                                class_ids_per_task, with_targets=False)
        plan = {k[5:]: v for k, v in batch.items()
                if k.startswith("plan_")} or None
        kw = {} if plan is None else {"plan": plan}
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            example["voxels"], example["num_points_per_voxel"],
            example["coordinates"], train=False, **kw)
        if double_flip:
            return model.predict_tta(example, preds, test_cfg)
        return model.predict(example, preds, test_cfg)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn, in_shardings=(repl, data),
                       out_shardings=data)
    return jax.jit(step_fn)


def make_loss_eval_step(model, voxel_generator, assigners, class_ids_per_task,
                        mesh: Optional[Mesh] = None):
    """Validation-loss step (reference workflow [('train', N), ('val', 1)])."""

    def step_fn(state: TrainState, batch):
        example = build_example(batch, voxel_generator, assigners,
                                class_ids_per_task, with_targets=True)
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            example["voxels"], example["num_points_per_voxel"],
            example["coordinates"], train=False)
        losses = model.loss(example, preds)
        return {"loss": sum(losses["loss"])}

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=repl)
    return jax.jit(step_fn)
