"""MFU / bandwidth-utilization report: compiled cost analysis / step time.

Ties tools/get_flops.py's XLA cost analysis to measured wall-clock of the
actual jitted train and predict steps, against the chip's peak numbers —
the roofline answer to "is this fast?".

Usage:
  python tools/mfu.py configs/kitti_car_pointpillars.py \
      [--batch 4] [--points 16384] [--peak-tflops 197] [--hbm-gbs 819]

Defaults are TPU v5e: 197 TFLOP/s bf16 MXU peak (fp32 matmuls lower to the
same units), 819 GB/s HBM.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from det3d_tpu.utils.env import setup_jax_from_env  # noqa: E402

setup_jax_from_env()


def _timeit(fn, fence, k_lo=5, k_hi=25):
    fn(); fence()
    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        fence()
        return time.perf_counter() - t0
    run(3)
    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def _cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbs", type=float, default=819.0)
    ap.add_argument("--steps", default="predict,train",
                    help="comma subset of predict,train (big sparse configs"
                         " compile slowly; run one step per invocation)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from det3d_tpu.apis.train import build_stack
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_predict_step, make_train_step)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    cfg = Config.fromfile(args.config)
    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)
    pc_range = tuple(cfg["voxel_generator"]["range"])
    n_feats = int(cfg["model"]["reader"].get("num_input_features", 4))

    b = structured_batch(args.batch, args.points, pc_range)
    pts = np.asarray(b["points"])[..., :n_feats]
    if pts.shape[-1] < n_feats:
        pts = np.concatenate(
            [pts, np.zeros(pts.shape[:-1] + (n_feats - pts.shape[-1],),
                           np.float32)], -1)
    gt = np.zeros((args.batch, 8, assigners[0].box_coder.n_dim), np.float32)
    gt[:, :, 3:6] = 1.0
    batch = {
        "points": jnp.asarray(pts),
        "num_points": jnp.asarray(b["num_points"]),
        "gt_boxes": jnp.asarray(gt),
        "gt_classes": jnp.ones((args.batch, 8), jnp.int32),
        "gt_valid": jnp.zeros((args.batch, 8), bool),
    }

    example = build_example(batch, voxel_gen, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 100)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)

    train_step = make_train_step(model, voxel_gen, assigners, class_ids)
    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg)

    print(f"config: {args.config}  batch={args.batch} points={args.points}")
    wanted = {s.strip() for s in args.steps.split(",")}
    # predict first: the train step donates its state argument
    for name, step in (("predict", predict_step), ("train", train_step)):
        if name not in wanted:
            continue
        comp = step.lower(state, batch).compile()
        if name == "train":
            st = state
            def call():
                nonlocal st
                st, _ = step(st, batch)
            def fence():
                nonlocal st
                float(jax.tree_util.tree_leaves(st.params)[0].sum())
        else:
            def call():
                step(state, batch)
            def fence():
                float(step(state, batch)["scores"].sum())
        flops, byts = _cost(comp)
        t = _timeit(call, fence)
        mfu = flops / t / (args.peak_tflops * 1e12)
        bwu = byts / t / (args.hbm_gbs * 1e9)
        # "bytes accessed" counts full gather operands per op, so bwu is
        # an upper bound on physical traffic and can exceed 100% on
        # gather-heavy programs
        bwu_s = (f"{bwu * 100:5.1f}%" if bwu <= 1.0
                 else f">100% (gather-inflated x{bwu:.1f})")
        print(f"{name:8s}: {t * 1e3:8.2f} ms/step "
              f"({t * 1e3 / args.batch:7.2f} ms/scan)  "
              f"flops={flops / 1e9:8.1f}G  bytes={byts / 1e9:7.2f}GB  "
              f"MFU={mfu * 100:5.2f}%  HBM-util={bwu_s}")


if __name__ == "__main__":
    main()
