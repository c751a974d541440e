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


if __name__ == "__main__":
    main()
