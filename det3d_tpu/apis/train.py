"""Config-driven train / eval drivers.

Parity: reference det3d/torchie/apis/train.py:250-325 ``train_detector`` and
tools/dist_test.py's eval path — re-designed around one jitted device step:
dataloaders feed padded host batches; voxelization, target assignment,
forward, loss, gradient psum and the optimizer update all run fused on the
mesh (parallel/train.py). DDP/SyncBN/DistOptimizerHook have no equivalents
here; the mesh is the distribution strategy.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from det3d_tpu.core.anchors import build_box_coder
from det3d_tpu.core.target import build_target_assigners
from det3d_tpu.core.voxelize import VoxelGenerator
from det3d_tpu.datasets import build_dataloader, build_dataset
from det3d_tpu.models.builder import build_detector
from det3d_tpu.parallel.mesh import make_mesh
from det3d_tpu.parallel.train import (TrainState, build_example,
                                      make_loss_eval_step, make_predict_step,
                                      make_train_step)
from det3d_tpu.runtime.hooks import (CheckpointHook, IterTimerHook,
                                     TensorboardLoggerHook, TextLoggerHook)
from det3d_tpu.runtime.trainer import Trainer
from det3d_tpu.solver import build_optimizer
from det3d_tpu.solver.schedules import build_lr_schedule

BATCH_KEYS = ("points", "num_points", "gt_boxes", "gt_classes", "gt_valid",
              "point_lin", "point_perm")


def batch_to_device(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()
            if k in BATCH_KEYS or k.startswith("plan_")}


def inject_host_plan(cfg, model, voxel_gen, split: str = "train",
                     train: bool = True) -> bool:
    """Append the HostPlan pipeline stage to a split's pipeline when the
    model's sparse middle can consume host-precomputed rulebooks.

    Loader workers then build every rulebook on the CPU (ops/sparse_host.py)
    and the device step skips the whole chain. Opt out with
    ``host_plan = False`` in the config. Mutates cfg's pipeline in place;
    returns True when injected (or already present)."""
    from det3d_tpu.models.backbones import middle_plan_spec

    if not cfg.get("host_plan", True):
        return False
    backbone = getattr(model, "backbone", None)
    if backbone is None or "SpMiddle" not in type(backbone).__name__:
        return False
    if voxel_gen.effective_order not in ("hashed", "yxz"):
        return False  # the appearance voxel ordering has no host twin
    pipeline = cfg["data"][split].get("pipeline")
    if not pipeline or any(
            (p.get("type") if isinstance(p, dict) else "") == "HostPlan"
            for p in pipeline):
        return bool(pipeline)
    spec = middle_plan_spec(backbone, voxel_gen.grid_size,
                            voxel_gen.max_voxels)
    pipeline.append(dict(
        type="HostPlan",
        voxel=dict(voxel_size=tuple(voxel_gen.voxel_size),
                   pc_range=tuple(voxel_gen.point_cloud_range),
                   grid_size=tuple(voxel_gen.grid_size),
                   max_voxels=int(voxel_gen.max_voxels),
                   order=voxel_gen.effective_order),
        spec=spec, train=train))
    logging.getLogger("det3d").info(
        "host rulebook plans: ON for %s (%d stages, order=%s) — loader "
        "workers build the sparse middle's rulebooks", split,
        len(spec["stages"]), voxel_gen.effective_order)
    return True


def host_plan_fn(model, voxel_gen, train: bool = False,
                 voxelize: bool = False):
    """Serving-path twin of ``inject_host_plan``: a callable that builds
    the packed host rulebook plans for an in-memory numpy batch.

    Returns ``fn(points (B, P, C), num_points (B,)) -> {key: (B, ...)}``
    (the ``point_lin``/``point_perm``/``plan_*`` arrays the jitted steps
    consume), or None when the model has no sparse middle or the
    voxelizer order has no host twin. Serving systems call this in their
    request pre-processing thread — the same place the reference runs its
    CPU voxelizer (tools/dist_test.py:179-217 keeps it outside the timed
    region) — so the device step spends zero time on rulebook builds.

    ``voxelize=True`` additionally voxelizes on the host
    (ops/voxelize_host.py): the returned plan carries the example's
    ``voxels``/``coordinates``/... keys and the jitted step skips
    voxelization entirely (build_example passthrough) — and this works for
    DENSE (pillar) models too, for which the rulebook plan is empty."""
    import numpy as np
    from det3d_tpu.models.backbones import middle_plan_spec
    from det3d_tpu.ops import sparse_host as sph

    backbone = getattr(model, "backbone", None)
    sparse_mid = (backbone is not None
                  and "SpMiddle" in type(backbone).__name__
                  and voxel_gen.effective_order in ("hashed", "yxz"))
    if not sparse_mid:
        if not voxelize:
            return None
        from det3d_tpu.ops.voxelize_host import host_voxelize_batch

        def vox_fn(points, num_points):
            return host_voxelize_batch(points, num_points, voxel_gen)

        return vox_fn
    spec = middle_plan_spec(backbone, voxel_gen.grid_size,
                            voxel_gen.max_voxels)
    kw = dict(voxel_size=tuple(voxel_gen.voxel_size),
              pc_range=tuple(voxel_gen.point_cloud_range),
              grid_size=tuple(voxel_gen.grid_size),
              max_voxels=int(voxel_gen.max_voxels),
              order=voxel_gen.effective_order, spec=spec, train=train)

    serve_band = None if train else getattr(backbone, "serve_band", None)

    def fn(points, num_points):
        points = np.asarray(points)
        num_points = np.asarray(num_points)
        plans = [sph.build_plan(points[i], num_points[i], **kw)
                 for i in range(points.shape[0])]
        out = {k: np.stack([p[k] for p in plans]) for k in plans[0]}
        if voxelize:
            from det3d_tpu.ops.voxelize_host import host_voxelize
            vkw = dict(voxel_size=tuple(voxel_gen.voxel_size),
                       pc_range=tuple(voxel_gen.point_cloud_range),
                       grid_size=tuple(voxel_gen.grid_size),
                       max_voxels=int(voxel_gen.max_voxels),
                       max_points=int(voxel_gen.max_num_points),
                       order=voxel_gen.order,
                       fuse_mean=bool(voxel_gen.fuse_mean))
            # the plan already owns lin/perm — voxelize without resorting
            vox = [host_voxelize(points[i], num_points[i],
                                 lin=p["point_lin"], perm=p["point_perm"],
                                 **vkw)
                   for i, p in enumerate(plans)]
            out.update({
                "voxels": np.stack([d["voxels"] for d in vox]),
                "coordinates": np.stack([d["coords"] for d in vox]),
                "num_points_per_voxel": np.stack(
                    [d["num_points_per_voxel"] for d in vox]),
                "num_voxels": np.stack([d["num_voxels"] for d in vox])})
            # lin/perm fed the device voxelizer, which the passthrough skips
            out.pop("point_lin", None)
            out.pop("point_perm", None)
        if serve_band is not None:
            # the banded-matmul subm conv (ops/band_conv.py) silently
            # mis-fetches targets beyond its compiled bucket — certify
            # every subm stage of every scan before the batch ships
            from det3d_tpu.ops.band_conv import certify_plan_bands
            col_band = getattr(backbone, "serve_col_band", None)
            if not certify_plan_bands(
                    out, int(serve_band), col_band=col_band,
                    down_band=getattr(backbone, "serve_down_band", None),
                    down_col_band=getattr(backbone,
                                          "serve_down_col_band", None)):
                raise ValueError(
                    f"host plan exceeds serve_band={serve_band} (or "
                    f"serve_col_band={col_band}): raise the middle's "
                    "buckets (recompiles the predict step) or set them "
                    "to None for the slice-gather path")
        return out

    return fn


def build_stack(cfg):
    """Build (model, voxel_gen, assigners, class_ids_per_task, test_cfg)
    from a reference-schema config."""
    vg_cfg = cfg["voxel_generator"]
    # mean readers get the fused voxelize+VFE path (no (V, T, C) buffer;
    # core/voxelize.py::voxelize_mean) unless the config opts out
    reader_type = cfg["model"].get("reader", {}).get("type", "")
    fuse_mean = vg_cfg.get("fuse_mean",
                           reader_type == "VoxelFeatureExtractorV3")
    voxel_gen = VoxelGenerator(
        voxel_size=vg_cfg["voxel_size"],
        point_cloud_range=vg_cfg["range"],
        max_num_points=vg_cfg.get("max_points_in_voxel", 100),
        max_voxels=vg_cfg.get("max_voxel_num", 20000),
        order=vg_cfg.get("order", "appearance"),
        fuse_mean=bool(fuse_mean))
    grid = voxel_gen.grid_size

    # order="yxz" emits voxel rows in the sparse middles' bitmap rank
    # order; tell the backbone so it skips its res0 argsort + row reorder
    model_cfg = cfg["model"]
    bb_cfg = (model_cfg or {}).get("backbone") or {}
    if (voxel_gen.order == "yxz"
            and "SpMiddle" in str(bb_cfg.get("type", ""))):
        model_cfg = dict(model_cfg,
                         backbone=dict(bb_cfg, pre_ranked=True))

    model = build_detector(model_cfg, train_cfg=cfg.get("train_cfg"),
                           test_cfg=cfg.get("test_cfg"), grid_size=grid)

    assigner_cfg = cfg["assigner"]
    box_coder = build_box_coder(assigner_cfg["box_coder"])
    tasks = cfg["tasks"]
    assigners = build_target_assigners(
        assigner_cfg["target_assigner"], box_coder, tasks)
    osf = int(assigner_cfg["out_size_factor"])
    fm = [1, grid[1] // osf, grid[0] // osf]
    for a in assigners:
        a.generate_anchors(fm)
        if a.anchor_area_threshold >= 0:
            a.prepare_anchors_mask(voxel_gen.voxel_size,
                                   voxel_gen.point_cloud_range, grid)

    # global 1-based class ids per task (Preprocess numbers classes over the
    # flattened class_names list — pipelines/preprocess.py:196-200)
    flat: List[str] = []
    for t in tasks:
        flat += list(t["class_names"])
    class_ids_per_task = []
    for t in tasks:
        class_ids_per_task.append(
            [flat.index(n) + 1 for n in t["class_names"]])
    return model, voxel_gen, assigners, class_ids_per_task, \
        cfg.get("test_cfg")


def init_state(cfg, model, voxel_gen, sample_batch, total_steps,
               rng_seed=0, steps_per_epoch=1):
    example = build_example(sample_batch, voxel_gen, [], [],
                            with_targets=False)
    # jit the init: eager tracing dispatches thousands of tiny ops (minutes
    # over a remote TPU); compiled it is one program
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(rng_seed), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    base_lr = cfg["optimizer"].get("VALUE", {}).get("lr")
    lr_fn, mom_fn = build_lr_schedule(cfg["lr_config"], total_steps,
                                      steps_per_epoch=steps_per_epoch,
                                      base_lr=base_lr)
    tx = build_optimizer(cfg["optimizer"], lr_fn, mom_fn)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    return state, lr_fn


def train_detector(cfg, work_dir: Optional[str] = None,
                   resume_from: Optional[str] = None,
                   logger: Optional[logging.Logger] = None,
                   use_mesh: bool = True, seed: int = 0):
    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)

    data_cfg = cfg["data"]
    inject_host_plan(cfg, model, voxel_gen)
    train_ds = build_dataset(data_cfg["train"])
    samples_per_gpu = data_cfg.get("samples_per_gpu", 2)
    n_dev = len(jax.devices())
    # reference semantics: per-device batch times device count. Set
    # scale_batch_by_devices=False to pin the GLOBAL batch to
    # samples_per_gpu (exact step-count parity with a reference run).
    if cfg.get("scale_batch_by_devices", True):
        batch_size = samples_per_gpu * n_dev
    else:
        batch_size = samples_per_gpu
    loader = build_dataloader(
        train_ds, batch_size,
        workers_per_gpu=data_cfg.get("workers_per_gpu", 0),
        dist=jax.process_count() > 1, seed=seed)

    total_epochs = int(cfg.get("total_epochs", 20))
    total_steps = len(loader) * total_epochs

    first = batch_to_device(next(iter(loader)))
    state, lr_fn = init_state(cfg, model, voxel_gen, first, total_steps,
                              rng_seed=seed, steps_per_epoch=len(loader))

    mesh = (make_mesh()
            if use_mesh and n_dev > 1 and batch_size % n_dev == 0
            else None)
    train_step_raw = make_train_step(model, voxel_gen, assigners, class_ids,
                                     mesh=mesh)

    def train_step(state, batch):
        return train_step_raw(state, batch_to_device(batch))

    val_step = None
    workflow = list(cfg.get("workflow", [("train", 1)]))
    loaders = []
    for mode, _ in workflow:
        if mode == "train":
            loaders.append(loader)
        else:
            val_ds = build_dataset(data_cfg["val"])
            val_loader = build_dataloader(
                val_ds, batch_size,
                workers_per_gpu=data_cfg.get("workers_per_gpu", 0),
                dist=jax.process_count() > 1, shuffle=False, seed=seed)
            loaders.append(val_loader)
            raw_val = make_loss_eval_step(model, voxel_gen, assigners,
                                          class_ids, mesh=mesh)

            def val_step(state, batch, _raw=raw_val):  # noqa: F811
                return _raw(state, batch_to_device(batch))

    trainer = Trainer(state, train_step, val_step, work_dir=work_dir,
                      lr_fn=lr_fn, logger=logger,
                      meta={"config": cfg.get("_text", ""),
                            "classes": [t["class_names"]
                                        for t in cfg["tasks"]]})
    trainer.register_hook(IterTimerHook())
    trainer.register_hook(
        CheckpointHook(interval=int(cfg.get("checkpoint_interval", 1))))
    log_interval = int(cfg.get("log_interval",
                               cfg.get("log_config", {}).get("interval", 10)))
    trainer.register_hook(TextLoggerHook(interval=log_interval), "VERY_LOW")
    if work_dir and cfg.get("tensorboard", True):
        trainer.register_hook(
            TensorboardLoggerHook(interval=log_interval), "VERY_LOW")
    if resume_from:
        trainer.resume(resume_from)
    elif cfg.get("resume_from"):
        trainer.resume(cfg["resume_from"])

    trainer.run(loaders, workflow, total_epochs)
    return trainer


def eval_detector(cfg, state, work_dir: Optional[str] = None,
                  split: str = "val", use_mesh: bool = True):
    """Run prediction over a split and the dataset's official evaluation.

    Parity: tools/dist_test.py:130-241 (minus the NCCL plumbing)."""
    from det3d_tpu.datasets.loader.loader import collate

    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)
    data_cfg = cfg["data"]
    # host rulebook plans accelerate eval predicts too — except under
    # double-flip TTA, where the step flips the points internally
    tta = bool((test_cfg or {}).get("double_flip", False)
               if isinstance(test_cfg, dict)
               else getattr(test_cfg, "double_flip", False))
    if not tta:
        inject_host_plan(cfg, model, voxel_gen, split=split, train=False)
    ds = build_dataset(data_cfg[split])
    batch_size = data_cfg.get("samples_per_gpu", 2)

    # multi-host: each process predicts a contiguous shard, detections are
    # gathered to every host before evaluation (reference dist_test.py:214)
    n_proc = jax.process_count()
    proc = jax.process_index()
    shard = list(range(len(ds)))[proc::n_proc] if n_proc > 1 else         list(range(len(ds)))

    def batches():
        # fixed batch shape: pad the tail chunk by repeating its last
        # example (duplicate tokens just overwrite in the detections dict)
        for i in range(0, len(shard), batch_size):
            examples = [ds[j] for j in shard[i:i + batch_size]]
            while len(examples) < batch_size:
                examples.append(examples[-1])
            yield collate(examples)

    mesh = None
    if use_mesh:
        n_dev = len(jax.devices())
        if n_dev > 1 and batch_size % n_dev == 0:
            mesh = make_mesh()
        else:
            logging.getLogger("det3d").warning(
                "eval_detector(use_mesh=True): batch_size %d not divisible "
                "by %d devices; predicting unsharded", batch_size, n_dev)
    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg, mesh=mesh)
    detections: Dict[str, Any] = {}
    import time
    times = []
    for batch in batches():
        t0 = time.perf_counter()
        out = predict_step(state, batch_to_device(batch))
        out = jax.tree_util.tree_map(np.asarray, out)
        times.append(time.perf_counter() - t0)
        metas = batch["metadata"]
        for b, meta in enumerate(metas):
            v = out["valid"][b]
            detections[str(meta["token"])] = {
                "box3d_lidar": out["box3d_lidar"][b][v],
                "scores": out["scores"][b][v],
                "label_preds": out["label_preds"][b][v],
                "metadata": meta,
            }
    if len(times) > 2:
        mid = times[len(times) // 3: 2 * len(times) // 3]
        per_frame = float(np.mean(mid)) / batch_size
        print(f"Total time per frame: {per_frame * 1e3:.1f} ms")
    if n_proc > 1:
        from det3d_tpu.parallel.dist_utils import all_gather_objects
        for d in all_gather_objects(detections):
            detections.update(d)
    results, dt_annos = ds.evaluation(detections, work_dir)
    return results, detections
