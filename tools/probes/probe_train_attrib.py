"""Attribute the full SECOND train step (B=2, V~20k) into segments.

Times, each as its own jitted program on the same data:

  a. full train step (make_train_step — the 220 ms/step number)
  b. build_example only (voxelize + target assign)
  c. loss forward only (apply train=True + loss, no grad)
  d. value_and_grad of the loss (no optimizer update)

(a-d) = optimizer/update overhead; (d-c) ~= backward; segments let us see
whether the remaining train cost is middle bwd, RPN bwd, or data plane.

Run: python tools/probes/probe_train_attrib.py [config] [batch]
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
    from det3d_tpu.parallel.train import (TrainState, build_example,
                                          make_train_step)
    from det3d_tpu.solver import build_optimizer, one_cycle
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    config = sys.argv[1] if len(sys.argv) > 1 else "configs/kitti_car_second.py"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    cfg = Config.fromfile(config)
    model, voxel_gen, assigners, class_ids, _ = build_stack(cfg)
    pc_range = tuple(cfg["voxel_generator"]["range"])
    n_feats = cfg["model"]["reader"].get("num_input_features", 4)

    b = structured_batch(batch, 18000, pc_range, seed=3)
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
                            with_targets=True,
                            rng=jax.random.PRNGKey(0))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(1e-3, 10)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)

    # pristine copies: the train step donates its state argument
    params0 = jax.tree_util.tree_map(jnp.copy, state.params)
    stats0 = jax.tree_util.tree_map(jnp.copy, state.batch_stats)

    # a. full step — state threaded through (step donates its state arg)
    train_step = make_train_step(model, voxel_gen, assigners, class_ids)
    st = [state]

    def full():
        st[0], m = train_step(st[0], data)

    def full_fence():
        float(jax.tree_util.tree_leaves(st[0].params)[0].sum())

    t = timeit(full, full_fence)
    print(f"a. full train step   : {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")

    # b. build_example only
    @jax.jit
    def bex(d):
        ex = build_example(d, voxel_gen, assigners, class_ids,
                          with_targets=True, rng=jax.random.PRNGKey(0))
        return (ex["voxels"].sum() + sum(l.sum() for l in ex["labels"])
                + ex["coordinates"].sum())

    t = timeit(lambda: bex(data), lambda: float(bex(data)))
    print(f"b. build_example only: {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")

    def loss_fn(params):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": stats0},
            example["voxels"], example["num_points_per_voxel"],
            example["coordinates"], train=True, mutable=["batch_stats"])
        losses = model.loss(example, preds)
        return sum(losses["loss"])

    # c. forward only
    fwd = jax.jit(loss_fn)
    t = timeit(lambda: fwd(params0), lambda: float(fwd(params0)))
    print(f"c. loss forward only : {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")

    # d. value_and_grad (no update)
    @jax.jit
    def vg(params):
        l, g = jax.value_and_grad(loss_fn)(params)
        return l + sum(jnp.sum(jnp.abs(x))
                       for x in jax.tree_util.tree_leaves(g))

    t = timeit(lambda: vg(params0), lambda: float(vg(params0)))
    print(f"d. value_and_grad    : {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")


if __name__ == "__main__":
    main()
