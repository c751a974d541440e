"""Attribution of the PLAN-FED serving predict step (round 4).

Segments, each its own jit, timed by two-point slope on the chip:
  full      — make_predict_step with plan_* keys in the batch
  voxelize  — build_example alone (host lin/perm overrides: sort = gather)
  forward   — model.apply alone (plan-fed, no decode/NMS)
  middle    — reader + backbone alone (plan-fed)
  decode    — full minus forward minus voxelize (residual)

Run: python tools/probes/probe_serve_attrib.py [config] [batch] [points]
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
    from det3d_tpu.apis.train import build_stack, host_plan_fn
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_predict_step)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    config = sys.argv[1] if len(sys.argv) > 1 else "configs/kitti_car_second.py"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    points = int(sys.argv[3]) if len(sys.argv) > 3 else 16384

    cfg = Config.fromfile(config)
    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)
    pc_range = tuple(cfg["voxel_generator"]["range"])
    n_feats = cfg["model"]["reader"].get("num_input_features", 4)

    b = structured_batch(batch, points, pc_range, seed=3)
    pts = np.asarray(b["points"])[..., :4]
    if n_feats > 4:
        pts = np.concatenate(
            [pts, np.zeros(pts.shape[:-1] + (n_feats - 4,), np.float32)],
            axis=-1)
    data = {"points": jnp.asarray(pts),
            "num_points": jnp.asarray(b["num_points"])}
    plan_fn = host_plan_fn(model, voxel_gen, train=False, voxelize=True)
    if plan_fn is not None:                    # dense models have no plan
        plan = plan_fn(pts, np.asarray(b["num_points"]))
        data.update({k: jnp.asarray(v) for k, v in plan.items()})

    example = build_example(data, voxel_gen, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 10)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)

    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg)
    out = [None]
    def full():
        out[0] = predict_step(state, data)
    def fence_full():
        float(out[0]["scores"].sum())
    t_full = timeit(full, fence_full)

    vox_j = jax.jit(lambda d: build_example(d, voxel_gen, [], [],
                                            with_targets=False))
    def vox():
        out[0] = vox_j(data)
    def fence_vox():
        float(out[0]["num_voxels"].sum())
    t_vox = timeit(vox, fence_vox)

    pkeys = {k[5:]: v for k, v in data.items() if k.startswith("plan_")}

    @jax.jit
    def fwd_f(d):
        ex = build_example(d, voxel_gen, [], [], with_targets=False)
        plan_d = {k[5:]: v for k, v in d.items() if k.startswith("plan_")}
        kw = {"plan": plan_d} if plan_d else {}
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ex["voxels"], ex["num_points_per_voxel"], ex["coordinates"],
            train=False, **kw)
    def fwd():
        out[0] = fwd_f(data)
    def fence_fwd():
        float(jax.tree_util.tree_leaves(out[0])[0].sum())
    t_fwd = timeit(fwd, fence_fwd)

    @jax.jit
    def mid_f(d):
        ex = build_example(d, voxel_gen, [], [], with_targets=False)
        plan_d = {k[5:]: v for k, v in d.items() if k.startswith("plan_")}
        def m(mdl):
            feats = (mdl.reader(ex["voxels"], ex["num_points_per_voxel"],
                                ex["coordinates"], train=False)
                     if type(model).__name__ == "PointPillars" else
                     mdl.reader(ex["voxels"], ex["num_points_per_voxel"],
                                train=False))
            kw = {"plan": plan_d} if plan_d else {}
            return mdl.backbone(feats, ex["coordinates"], mdl.grid_size,
                                train=False, **(kw if type(model).__name__
                                                != "PointPillars" else {}))
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            method=m)
    def mid():
        out[0] = mid_f(data)
    def fence_mid():
        float(jax.tree_util.tree_leaves(out[0])[0].sum())
    t_mid = timeit(mid, fence_mid)

    print(f"config {config} B={batch} P={points}")
    print(f"full predict      : {t_full*1e3:7.2f} ms ({t_full/batch*1e3:6.2f} ms/scan)")
    print(f"  voxelize        : {t_vox*1e3:7.2f} ms")
    print(f"  fwd (vox+net)   : {t_fwd*1e3:7.2f} ms")
    print(f"    reader+middle : {t_mid*1e3:7.2f} ms")
    print(f"    neck+head     : {(t_fwd-t_mid)*1e3:7.2f} ms (residual)")
    print(f"  decode+NMS      : {(t_full-t_fwd)*1e3:7.2f} ms (residual)")


if __name__ == "__main__":
    main()
