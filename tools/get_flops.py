"""FLOPs / memory-traffic / parameter counter for a config's model.

Parity: reference tools/get_flops.py + det3d/utils/flops_counter.py —
re-designed on XLA's compiled cost analysis instead of module hooks: the
number reported is what the compiler actually schedules for one forward,
including the on-device voxelizer.

Usage: python tools/get_flops.py <config.py> [--batch 1] [--points 20000]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from det3d_tpu.utils.env import setup_jax_from_env  # noqa: E402

setup_jax_from_env()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--points", type=int, default=20000)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from det3d_tpu.apis.train import build_stack
    from det3d_tpu.parallel.train import build_example
    from det3d_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    model, voxel_gen, assigners, class_ids, _ = build_stack(cfg)
    n_feats = int(cfg["model"]["reader"].get("num_input_features", 4))

    pts = jnp.zeros((args.batch, args.points, n_feats), jnp.float32)
    npts = jnp.full((args.batch,), args.points, jnp.int32)

    def fwd(points, num_points, variables):
        ex = build_example({"points": points, "num_points": num_points},
                           voxel_gen, [], [], with_targets=False)
        return model.apply(variables, ex["voxels"],
                           ex["num_points_per_voxel"], ex["coordinates"],
                           train=False)

    ex = build_example({"points": pts, "num_points": npts}, voxel_gen, [],
                       [], with_targets=False)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ex["voxels"],
                           ex["num_points_per_voxel"], ex["coordinates"],
                           train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    compiled = jax.jit(fwd).lower(pts, npts, variables).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    n_params = sum(int(np.prod(v.shape)) for v in
                   jax.tree_util.tree_leaves(variables["params"]))
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    print(f"config:          {args.config}")
    print(f"input:           batch={args.batch} points={args.points}")
    print(f"params:          {n_params / 1e6:.2f} M")
    print(f"forward FLOPs:   {flops / 1e9:.2f} G")
    print(f"bytes accessed:  {byts / 1e9:.2f} GB")

    # per-module breakdown (reference det3d/utils/flops_counter.py:59-446
    # prints a per-module hook table; here every stage is lowered and
    # cost-analyzed separately, so the split is the compiler's own
    # schedule, not a hook estimate). Stage outputs chain via zeros of
    # the previous stage's inferred shapes.
    def cost(f, *inputs):
        c = jax.jit(f).lower(*inputs).compile().cost_analysis()
        c = c[0] if isinstance(c, list) else c
        return c.get("flops", 0.0), c.get("bytes accessed", 0.0)

    def zeros_of(shape_tree):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shape_tree)

    is_pp = type(model).__name__ == "PointPillars"

    def vox_f(p, n):
        return build_example({"points": p, "num_points": n}, voxel_gen,
                             [], [], with_targets=False)

    def reader_f(v, ex):
        if is_pp:
            return model.apply(v, method=lambda m: m.reader(
                ex["voxels"], ex["num_points_per_voxel"],
                ex["coordinates"], train=False))
        return model.apply(v, method=lambda m: m.reader(
            ex["voxels"], ex["num_points_per_voxel"], train=False))

    def backbone_f(v, feats, coors):
        return model.apply(v, method=lambda m: m.backbone(
            feats, coors, m.grid_size, train=False))

    def neck_f(v, x):
        return model.apply(v, method=lambda m: m.neck(x, train=False))

    def head_f(v, x):
        return model.apply(v, method=lambda m: m.bbox_head(x, train=False))

    rows = [("voxelize", *cost(vox_f, pts, npts))]
    feats = zeros_of(jax.eval_shape(reader_f, variables, ex))
    rows.append(("reader", *cost(reader_f, variables, ex)))
    bb_out = zeros_of(jax.eval_shape(backbone_f, variables, feats,
                                     ex["coordinates"]))
    rows.append(("backbone", *cost(backbone_f, variables, feats,
                                   ex["coordinates"])))
    x = bb_out
    if model.neck is not None:
        rows.append(("neck", *cost(neck_f, variables, x)))
        x = zeros_of(jax.eval_shape(neck_f, variables, x))
    rows.append(("bbox_head", *cost(head_f, variables, x)))

    def mod_params(name):
        sub = variables["params"].get(name, {})
        return sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(sub))

    total_f = sum(r[1] for r in rows) or 1.0
    print()
    print(f"{'module':<12} {'GFLOPs':>10} {'%':>6} {'GB moved':>10} "
          f"{'params (M)':>11}")
    for name, f, by in rows:
        print(f"{name:<12} {f / 1e9:>10.2f} {100 * f / total_f:>5.1f}% "
              f"{by / 1e9:>10.3f} {mod_params(name) / 1e6:>11.3f}")
    print("(stage sum can differ from the whole-program number: XLA fuses "
          "across stage boundaries in the full forward)")


if __name__ == "__main__":
    main()
