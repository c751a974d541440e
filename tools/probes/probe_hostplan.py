"""Measure the host-precomputed-rulebook train step against the baseline.

Times (two-point slope, host-readback fence):
  a. full train step, device-built rulebooks   (the baseline number)
  b. full train step, host plan in the batch   (device time only — the plan
     is built once outside the loop, as the loader's prefetch would)
  c. host plan build, numpy, per sample        (must be < step time / B to
     hide under prefetch with >= 1 worker per sample)
  d. plan transfer size (MB/step)

Run: python tools/probes/probe_hostplan.py [config] [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def timeit(fn, fence, k_lo=5, k_hi=25):
    fn(); fence()
    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        fence()
        return time.perf_counter() - t0
    run(3)
    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    from det3d_tpu.apis.train import build_stack
    from det3d_tpu.models.backbones import middle_plan_spec
    from det3d_tpu.ops import sparse_host as sph
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_train_step)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    config = sys.argv[1] if len(sys.argv) > 1 else "configs/kitti_car_second.py"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    points = int(sys.argv[3]) if len(sys.argv) > 3 else 18000

    cfg = Config.fromfile(config)
    model, voxel_gen, assigners, class_ids, _ = build_stack(cfg)
    pc_range = tuple(cfg["voxel_generator"]["range"])
    n_feats = cfg["model"]["reader"].get("num_input_features", 4)

    b = structured_batch(batch, points, pc_range, seed=3)
    pts = np.asarray(b["points"])[..., :n_feats]
    if pts.shape[-1] < n_feats:
        pts = np.concatenate(
            [pts, np.zeros(pts.shape[:-1] + (n_feats - pts.shape[-1],),
                           np.float32)], -1)
    gt = np.zeros((batch, 8, assigners[0].box_coder.n_dim), np.float32)
    gt[:, :, 3:6] = 1.0
    data = {"points": jnp.asarray(pts),
            "num_points": jnp.asarray(b["num_points"]),
            "gt_boxes": jnp.asarray(gt),
            "gt_classes": jnp.ones((batch, 8), jnp.int32),
            "gt_valid": jnp.zeros((batch, 8), bool)}

    example = build_example(data, voxel_gen, assigners, class_ids,
                            with_targets=True, rng=jax.random.PRNGKey(0))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 10)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)

    def fresh_state():
        return TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables["params"]),
            jax.tree_util.tree_map(jnp.copy, variables["batch_stats"]), tx)

    train_step = make_train_step(model, voxel_gen, assigners, class_ids)

    # a. baseline
    st = [fresh_state()]
    def full():
        st[0], m = train_step(st[0], data)
    def fence():
        float(jax.tree_util.tree_leaves(st[0].params)[0].sum())
    t = timeit(full, fence)
    print(f"a. step, device rulebooks : {t*1e3:8.2f} ms "
          f"({t/batch*1e3:7.2f} ms/scan)")

    # c. host plan build (numpy)
    spec = middle_plan_spec(model.backbone, voxel_gen.grid_size,
                            voxel_gen.max_voxels)
    pts_np = np.asarray(pts)
    n_np = np.asarray(b["num_points"])
    def one_plan(i):
        return sph.build_plan(pts_np[i], n_np[i],
                              voxel_size=voxel_gen.voxel_size,
                              pc_range=voxel_gen.point_cloud_range,
                              grid_size=voxel_gen.grid_size,
                              max_voxels=voxel_gen.max_voxels,
                              order=voxel_gen.effective_order, spec=spec, train=True)
    t0 = time.perf_counter()
    per = [one_plan(i) for i in range(batch)]
    t_host = (time.perf_counter() - t0) / batch
    print(f"c. host plan build (np)   : {t_host*1e3:8.2f} ms/sample")

    plan = {k: np.stack([d[k] for d in per]) for k in per[0]}
    nbytes = sum(v.nbytes for v in plan.values())
    print(f"d. plan transfer          : {nbytes/1e6:8.2f} MB/step")

    data_plan = dict(data, **{k: jnp.asarray(v) for k, v in plan.items()})

    # b. step with host plan (plan already on device = prefetch-hidden)
    st[0] = fresh_state()
    def full_plan():
        st[0], m = train_step(st[0], data_plan)
    t = timeit(full_plan, fence)
    print(f"b. step, host plan        : {t*1e3:8.2f} ms "
          f"({t/batch*1e3:7.2f} ms/scan)")

    # b2. including the host->device transfer each step (no prefetch)
    def full_plan_xfer():
        dp = dict(data, **{k: jax.device_put(v) for k, v in plan.items()})
        st[0], m = train_step(st[0], dp)
    t = timeit(full_plan_xfer, fence)
    print(f"b2. step + plan transfer  : {t*1e3:8.2f} ms "
          f"({t/batch*1e3:7.2f} ms/scan)")


if __name__ == "__main__":
    main()
