"""Finer attribution of the SECOND forward's 135 GB/step traffic.

Micro-jits: table build alone, subm queries alone, one gather-GEMM conv
layer, the full sparse middle alone, and the BEV trunk (neck+head) alone.

Run: python tools/probe_second2.py [batch]
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
    print(f"{name:>24}: {t * 1e3:8.2f} ms ({t / batch * 1e3:7.2f} ms/scan)"
          f"  bytes={byts / 1e9:7.2f} GB")


def main():
    import jax
    import jax.numpy as jnp

    from det3d_tpu.apis.train import build_stack
    from det3d_tpu.models.backbones import SpMiddleFHD
    from det3d_tpu.ops import sparse as sp
    from det3d_tpu.parallel.train import build_example
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = Config.fromfile("configs/kitti_car_second.py")
    model, voxel_gen, assigners, class_ids, test_cfg = build_stack(cfg)
    pc_range = tuple(cfg["voxel_generator"]["range"])

    b = structured_batch(batch_size, 16384, pc_range, seed=3)
    example = jax.jit(lambda p, n: build_example(
        {"points": p, "num_points": n}, voxel_gen, [], [],
        with_targets=False))(jnp.asarray(np.asarray(b["points"])),
                             jnp.asarray(b["num_points"]))

    grid = voxel_gen.grid_size
    nx, ny, nz = (int(s) for s in grid)
    shape0 = (nz + 1, ny, nx)
    coords = example["coordinates"]
    v = coords.shape[1]

    # 1. table build alone
    t_jit = jax.jit(lambda co: sp.build_lookup_batch(co, shape0)[1])
    comp = t_jit.lower(coords).compile()
    t = timeit(lambda: t_jit(coords), lambda: float(t_jit(coords)[0, 0]))
    report("res0 table build", comp, t, batch_size)

    # 2. subm queries against a prebuilt table
    table = t_jit(coords)

    def queries(tab, co):
        return sp.subm_rulebook_batch(co, shape0, 3, ("dense", tab))

    q_jit = jax.jit(queries)
    comp = q_jit.lower(table, coords).compile()
    t = timeit(lambda: q_jit(table, coords),
               lambda: float(q_jit(table, coords)[0].sum()))
    report("subm0 queries (27xV)", comp, t, batch_size)

    # 3. one 64ch gather-GEMM layer on a prebuilt rulebook
    idx, mask = q_jit(table, coords)
    feats = jnp.asarray(np.random.RandomState(0)
                        .randn(batch_size, v, 64).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(1)
                    .randn(27, 64, 64).astype(np.float32) * 0.05)
    c_jit = jax.jit(sp.apply_conv)
    comp = c_jit.lower(feats, idx, mask, w).compile()
    t = timeit(lambda: c_jit(feats, idx, mask, w),
               lambda: float(c_jit(feats, idx, mask, w).sum()))
    report("conv 64ch (27 taps)", comp, t, batch_size)

    # 4. sparse middle alone
    mid = SpMiddleFHD(num_input_features=4)
    vf0 = example["voxels"].mean(2)
    mv = jax.jit(lambda f, co: mid.init(jax.random.PRNGKey(0), f, co,
                                        grid, train=False))(vf0, coords)

    def middle(variables, f, co):
        return mid.apply(variables, f, co, grid, train=False)

    m_jit = jax.jit(middle)
    vf = example["voxels"].mean(2)
    comp = m_jit.lower(mv, vf, coords).compile()
    t = timeit(lambda: m_jit(mv, vf, coords),
               lambda: float(m_jit(mv, vf, coords).sum()))
    report("sparse middle (full)", comp, t, batch_size)


if __name__ == "__main__":
    main()
