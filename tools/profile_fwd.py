"""Per-stage forward profiling on the real TPU: PFN vs scatter vs RPN+head.

Isolates the superlinear batching cost seen in tools/profile_predict.py.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

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
    from __graft_entry__ import _build_flagship
    from det3d_tpu.parallel.train import build_example
    from det3d_tpu.utils.synth import structured_batch

    pc_range = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    model, voxel_gen, assigners, class_ids = _build_flagship(
        voxel_size=(0.16, 0.16, 4.0), pc_range=pc_range,
        max_points=32, max_voxels=12000)

    b1 = {k: jnp.asarray(v)
          for k, v in structured_batch(1, 16384, pc_range).items()}
    ex1 = build_example(b1, voxel_gen, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), ex1["voxels"], ex1["num_points_per_voxel"],
        ex1["coordinates"], train=False)

    grid = voxel_gen.grid_size
    reader = model.reader
    backbone = model.backbone

    @jax.jit
    def pfn_only(variables, voxels, num_points, coords):
        return reader.apply(
            {"params": variables["params"]["reader"],
             "batch_stats": variables["batch_stats"]["reader"]},
            voxels, num_points, coords, train=False)

    @jax.jit
    def scatter_only(feats, coords):
        return backbone.apply({}, feats, coords, grid, train=False)

    @jax.jit
    def neck_head(variables, canvas):
        x = model.neck.apply(
            {"params": variables["params"]["neck"],
             "batch_stats": variables["batch_stats"]["neck"]},
            canvas, train=False)
        return model.bbox_head.apply(
            {"params": variables["params"]["bbox_head"]}, x,
            train=False)[0]["cls_preds"]

    for bs in (1, 2, 4, 8):
        batch = {k: jnp.asarray(v)
                 for k, v in structured_batch(bs, 16384, pc_range).items()}
        ex = build_example(batch, voxel_gen, [], [], with_targets=False)
        feats = pfn_only(ex1 if False else variables, ex["voxels"],
                         ex["num_points_per_voxel"], ex["coordinates"])
        canvas = scatter_only(feats, ex["coordinates"])
        t_pfn = timeit(
            lambda: pfn_only(variables, ex["voxels"],
                             ex["num_points_per_voxel"], ex["coordinates"]),
            lambda: float(pfn_only(variables, ex["voxels"],
                                   ex["num_points_per_voxel"],
                                   ex["coordinates"]).sum()))
        t_sc = timeit(
            lambda: scatter_only(feats, ex["coordinates"]),
            lambda: float(scatter_only(feats, ex["coordinates"]).sum()))
        t_nh = timeit(
            lambda: neck_head(variables, canvas),
            lambda: float(neck_head(variables, canvas).sum()))
        print(f"B={bs}: pfn={t_pfn*1e3/bs:7.2f}  scatter={t_sc*1e3/bs:7.2f}"
              f"  neck+head={t_nh*1e3/bs:7.2f}  ms/scan", flush=True)


if __name__ == "__main__":
    main()
