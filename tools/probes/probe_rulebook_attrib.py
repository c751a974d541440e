"""Micro-attribute the rulebook/sort chain (78.5 ms of SECOND's 110 ms
fwd @ B=2 — probe_fwd_attrib) into its primitives, per stage.

For each resolution of the SpMiddleFHD chain, times as separate jitted
programs on the REAL coords that stage sees:

  - yxz argsort            (stage_lookup_batch's sort)
  - bitmap build           (scatter + popcount-cumsum over the BEV grid)
  - subm window queries    (9 column fetches / voxel)
  - conv_out_coords        (candidate gen + dedup sort + cap)
  - down window queries    (9 column fetches / output)
  - inverse rulebook       (4 column fetches / input, train only)

Run: python tools/probes/probe_rulebook_attrib.py [batch] [v]
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
    from det3d_tpu.utils.config import Config
    from det3d_tpu.utils.synth import structured_batch
    from det3d_tpu.apis.train import build_stack
    from det3d_tpu.parallel.train import build_example

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    cfg = Config.fromfile("configs/kitti_car_second.py")
    model, voxel_gen, assigners, class_ids, _ = build_stack(cfg)
    pc_range = tuple(cfg["voxel_generator"]["range"])
    b = structured_batch(batch, 18000, pc_range, seed=3)
    pts = np.asarray(b["points"])[..., :4]
    data = {"points": jnp.asarray(pts),
            "num_points": jnp.asarray(b["num_points"])}
    example = build_example(data, voxel_gen, assigners, class_ids,
                            with_targets=False)
    coords = example["coordinates"]
    nx, ny, nz = (int(s) for s in model.grid_size)
    shape = (nz + 1, ny, nx)
    v = coords.shape[1]

    def t_of(f, *args):
        fjit = jax.jit(f)
        fjit(*args)
        return timeit(lambda: fjit(*args),
                      lambda: float(jnp.asarray(
                          jax.tree_util.tree_leaves(fjit(*args))[0]
                      ).sum())) * 1e3

    specs = [None, (3, 2, 1), (3, 2, 1), (3, 2, (0, 1, 1))]
    co = coords
    total = 0.0
    for si, down in enumerate(specs):
        if down is not None:
            k, s, p = down
            t_oc = t_of(lambda c, sh=shape, kk=k, ss=s, pp=p: jax.vmap(
                lambda c1: sp.conv_out_coords(c1, sh, kk, ss, pp, v))(c),
                co)
            oshape = sp.out_spatial_shape(shape, k, s, p)
            oc, _ = jax.vmap(lambda c1: sp.conv_out_coords(
                c1, shape, k, s, p, v))(co)
            total += t_oc
        else:
            t_oc = 0.0
            oshape, oc = shape, co

        t_sort = t_of(lambda c, sh=oshape: jax.vmap(
            lambda c1: sp.yxz_order(c1, sh))(c), oc)
        perm = jax.vmap(lambda c1: sp.yxz_order(c1, oshape))(oc)
        oc_sorted = jnp.take_along_axis(oc, perm[..., None], axis=1)
        t_bm = t_of(lambda c, sh=oshape: sp.build_bitmap_batch(c, sh),
                    oc_sorted)
        bm = sp.build_bitmap_batch(oc_sorted, oshape)
        lk = ("bitmap", bm)
        t_subm = t_of(lambda c, sh=oshape, l=lk:
                      sp.subm_window_rulebook_batch(c, sh, 3, l),
                      oc_sorted)
        total += t_sort + t_bm + t_subm

        t_down = t_inv = 0.0
        if down is not None:
            k, s, p = down
            t_down = t_of(lambda c, insh=shape, l=in_lk, kk=k, ss=s, pp=p:
                          sp.conv_window_rulebook_batch(insh, c, kk, ss,
                                                        pp, l), oc_sorted)
            t_inv = t_of(lambda c, kk=k, ss=s, pp=p, l=lk, osh=oshape:
                         sp.strided_inverse_rulebook_batch(c, kk, ss, pp,
                                                           l, osh),
                         co_prev_sorted)
            total += t_down + t_inv

        print(f"stage {si} {str(oshape):>16}: out_coords {t_oc:6.2f}  "
              f"sort {t_sort:6.2f}  bitmap {t_bm:6.2f}  subm_q {t_subm:6.2f}"
              f"  down_q {t_down:6.2f}  inv_q {t_inv:6.2f} ms")

        co_prev_sorted = oc_sorted
        co, shape, in_lk = oc_sorted, oshape, lk

    print(f"total: {total:.2f} ms ({total/batch:.2f} ms/scan)")


if __name__ == "__main__":
    main()
