"""Attribute the SECOND forward (58 ms/scan train fwd) into components.

Times, each as its own jitted program on the same voxelized data:

  a. full model forward (reader -> middle -> RPN -> head)
  b. reader (VFE) only
  c. middle only (on VFE output)
  d. rulebook/sort chain only (every stage_lookup + window rulebook +
     conv_out_coords + inverse the middle builds, no conv math)
  e. RPN + head only (on a random BEV canvas of the middle's output shape)

(c - d) ~= window-gather + GEMM cost; (a - b - c - e) ~= composition
overhead. Run: python tools/probes/probe_fwd_attrib.py [config] [batch]
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
    import det3d_tpu.ops.sparse as sp
    from det3d_tpu.apis.train import build_stack
    from det3d_tpu.models.backbones import _stage_rulebooks
    from det3d_tpu.parallel.train import build_example
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    config = sys.argv[1] if len(sys.argv) > 1 else "configs/kitti_car_second.py"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    train = len(sys.argv) > 3 and sys.argv[3] == "train"

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
    data = {"points": jnp.asarray(pts),
            "num_points": jnp.asarray(b["num_points"])}
    example = build_example(data, voxel_gen, assigners, class_ids,
                            with_targets=False)
    voxels = example["voxels"]
    npv = example["num_points_per_voxel"]
    coords = example["coordinates"]
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), voxels, npv, coords, train=False)

    def fence_of(f, *a):
        out = f(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return lambda: float(leaves[0].sum())

    # a. full forward
    @jax.jit
    def full(v, n, c):
        return model.apply(variables, v, n, c, train=False)

    t = timeit(lambda: full(voxels, npv, coords),
               lambda: float(jax.tree_util.tree_leaves(
                   full(voxels, npv, coords))[0].sum()))
    print(f"a. full forward     : {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")

    def subvars(name):
        sv = {"params": variables["params"].get(name, {})}
        if "batch_stats" in variables and name in variables["batch_stats"]:
            sv["batch_stats"] = variables["batch_stats"][name]
        return sv

    # b. reader only
    @jax.jit
    def reader(v, n, c):
        return model.reader.apply(subvars("reader"), v, n, c, train=False)

    feats = reader(voxels, npv, coords)
    t = timeit(lambda: reader(voxels, npv, coords),
               lambda: float(reader(voxels, npv, coords).sum()))
    print(f"b. reader (VFE)     : {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")

    # c. middle only
    @jax.jit
    def middle(f, c):
        return model.backbone.apply(subvars("backbone"), f, c,
                                    model.grid_size, train=False)

    canvas = middle(feats, coords)
    t = timeit(lambda: middle(feats, coords),
               lambda: float(middle(feats, coords).sum()))
    print(f"c. middle only      : {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")

    # d. rulebook/sort chain only (mirror SpMiddleFHD stage structure)
    nx, ny, nz = (int(s) for s in model.grid_size)
    shape0 = (nz + 1, ny, nx)
    v = coords.shape[1]
    caps = [v, v, v, v]

    @jax.jit
    def rulebooks(c):
        acc = []
        order0, co, lk = sp.stage_lookup_batch(c, shape0)
        sidx, smask = sp.subm_window_rulebook_batch(co, shape0, 3, lk)
        acc += [order0.sum(), sidx.sum(), smask.sum()]
        shape = shape0
        specs = [(3, 2, 1), (3, 2, 1), (3, 2, (0, 1, 1))]
        for i, (k, s, p) in enumerate(specs):
            last = i == len(specs) - 1
            (co, didx, dmask, sidx, smask, shape, lk,
             dinv) = _stage_rulebooks(co, shape, k, s, p, caps[i], lk,
                                      build_subm=not last,
                                      build_inverse=train)
            acc += [didx.sum(), dmask.sum()]
            if sidx is not None:
                acc += [sidx.sum(), smask.sum()]
            if dinv is not None:
                acc += [x.sum() for x in dinv[:3]]
        return sum(jnp.asarray(a, jnp.float32).sum() for a in acc)

    t = timeit(lambda: rulebooks(coords), lambda: float(rulebooks(coords)))
    print(f"d. rulebooks only   : {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)"
          f"{' (train: +inverse)' if train else ''}")

    # e. RPN + head on a random canvas
    rng = np.random.RandomState(0)
    canvas_r = jnp.asarray(rng.randn(*canvas.shape).astype(np.float32))

    @jax.jit
    def rpn_head(x):
        y = x
        if model.neck is not None:
            y = model.neck.apply(subvars("neck"), y, train=False)
        return model.bbox_head.apply(subvars("bbox_head"), y, train=False)

    t = timeit(lambda: rpn_head(canvas_r),
               lambda: float(jax.tree_util.tree_leaves(
                   rpn_head(canvas_r))[0].sum()))
    print(f"e. neck+head only   : {t*1e3:8.2f} ms ({t/batch*1e3:7.2f} ms/scan)")


if __name__ == "__main__":
    main()
