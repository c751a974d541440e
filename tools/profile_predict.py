"""Profile the PointPillars predict path on the real TPU across batch sizes.

Separates the cost of (a) full predict (voxelize+fwd+decode+NMS),
(b) forward-only (voxelize+fwd), (c) voxelize-only, at B in {1,2,4,8},
using the two-point-slope timing that is honest under the axon relay
(see docs/DESIGN_NOTES.md §7).

Usage: python tools/profile_predict.py [--bs 1,2,4,8] [--stages all|predict]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, fence, k_lo=5, k_hi=25):
    fn(); fence()  # compile + settle
    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        fence()
        return time.perf_counter() - t0
    run(3)
    t_lo = run(k_lo)
    t_hi = run(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="1,2,4,8")
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_flagship
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_predict_step)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.synth import structured_batch

    pc_range = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    model, voxel_gen, assigners, class_ids = _build_flagship(
        voxel_size=(0.16, 0.16, 4.0), pc_range=pc_range,
        max_points=32, max_voxels=12000)
    test_cfg = dict(
        nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
                 nms_pre_max_size=1000, nms_post_max_size=300,
                 nms_iou_threshold=0.5),
        score_threshold=0.05,
        post_center_limit_range=[0, -40.0, -5.0, 70.4, 40.0, 5.0],
        max_per_img=100)

    b1 = {k: jnp.asarray(v)
          for k, v in structured_batch(1, 16384, pc_range).items()}
    example = build_example(b1, voxel_gen, [], [], with_targets=False)
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

    @jax.jit
    def fwd_step(state, batch):
        ex = build_example(batch, voxel_gen, [], [], with_targets=False)
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ex["voxels"], ex["num_points_per_voxel"], ex["coordinates"],
            train=False)
        return preds[0]["cls_preds"]

    @jax.jit
    def vox_step(batch):
        ex = build_example(batch, voxel_gen, [], [], with_targets=False)
        return ex["voxels"]

    for bs in [int(b) for b in args.bs.split(",")]:
        batch = {k: jnp.asarray(v)
                 for k, v in structured_batch(bs, 16384, pc_range).items()}
        out = {}
        t = timeit(lambda: predict_step(state, batch),
                   lambda: float(predict_step(state, batch)["scores"].sum()))
        out["predict"] = t
        if args.stages == "all":
            out["fwd"] = timeit(
                lambda: fwd_step(state, batch),
                lambda: float(fwd_step(state, batch).sum()))
            out["vox"] = timeit(
                lambda: vox_step(batch),
                lambda: float(vox_step(batch).sum()))
        line = f"B={bs}: " + "  ".join(
            f"{k}={v * 1e3:8.2f} ms ({v * 1e3 / bs:7.2f} ms/scan)"
            for k, v in out.items())
        print(line, flush=True)


if __name__ == "__main__":
    main()
