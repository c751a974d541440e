"""Stage-level timing of the SECOND path on the real TPU.

Splits the predict program into sub-jits and times each: voxelize+reader,
rulebook builds (per resolution), sparse conv stack given prebuilt
rulebooks, BEV neck+head, decode+NMS. Each sub-jit also reports its
compiled bytes-accessed so the 68 GB/scan mystery (tools/mfu.py) can be
attributed.

Run: python tools/probe_second.py [batch]
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


def report(name, comp, t, batch):
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    byts = float(ca.get("bytes accessed", 0.0))
    print(f"{name:>22}: {t * 1e3:8.2f} ms ({t / batch * 1e3:7.2f} ms/scan)"
          f"  bytes={byts / 1e9:7.2f} GB")


def main():
    import jax
    import jax.numpy as jnp

    from det3d_tpu.apis.train import build_stack
    from det3d_tpu.ops import sparse as sp
    from det3d_tpu.parallel.train import build_example
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = Config.fromfile("configs/kitti_car_second.py")
    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)
    pc_range = tuple(cfg["voxel_generator"]["range"])

    b = structured_batch(batch_size, 16384, pc_range, seed=3)
    batch = {"points": jnp.asarray(np.asarray(b["points"])),
             "num_points": jnp.asarray(b["num_points"])}

    # ---- stage A: voxelize + reader example build
    def stage_a(points, num_points):
        return build_example({"points": points, "num_points": num_points},
                             voxel_gen, [], [], with_targets=False)

    a_jit = jax.jit(stage_a)
    comp_a = a_jit.lower(batch["points"], batch["num_points"]).compile()
    example = a_jit(batch["points"], batch["num_points"])
    t_a = timeit(lambda: a_jit(batch["points"], batch["num_points"]),
                 lambda: float(a_jit(batch["points"],
                                     batch["num_points"])["voxels"].sum()))
    report("voxelize+example", comp_a, t_a, batch_size)

    grid = voxel_gen.grid_size
    nx, ny, nz = (int(s) for s in grid)
    shape0 = (nz + 1, ny, nx)
    coords = example["coordinates"]

    # ---- stage B: rulebook builds alone (res0 lookup + subm + down)
    def stage_b(co):
        lk0 = sp.build_lookup_batch(co, shape0)
        sidx0, smask0 = sp.subm_rulebook_batch(co, shape0, 3, lk0)
        co1, _ = jax.vmap(
            lambda c: sp.conv_out_coords(c, shape0, 3, 2, 1,
                                         co.shape[1]))(co)
        didx, dmask = sp.conv_rulebook_batch(shape0, co1, 3, 2, 1, lk0)
        return sidx0, smask0, didx, dmask, co1

    b_jit = jax.jit(stage_b)
    comp_b = b_jit.lower(coords).compile()
    t_b = timeit(lambda: b_jit(coords),
                 lambda: float(b_jit(coords)[0].sum()))
    report("res0 rulebooks", comp_b, t_b, batch_size)

    # ---- stage C: full detector forward (voxels precomputed)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"],
        train=False)

    def stage_c(v, vox, npv, co):
        return model.apply(v, vox, npv, co, train=False)

    c_jit = jax.jit(stage_c)
    args_c = (variables, example["voxels"], example["num_points_per_voxel"],
              example["coordinates"])
    comp_c = c_jit.lower(*args_c).compile()
    t_c = timeit(lambda: c_jit(*args_c),
                 lambda: float(jax.tree_util.tree_leaves(
                     c_jit(*args_c))[0].sum()))
    report("model fwd (full)", comp_c, t_c, batch_size)


if __name__ == "__main__":
    main()
