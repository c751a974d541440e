"""Microbenchmark: element-gather vs 3-wide slice-gather rulebook queries.

The rulebook floor is element gathers into the dense lookup table
(~7.5-12.6 ns/query, descriptor-rate-bound). The 3 x-taps of each
(dz, dy) kernel row hit CONSECUTIVE linear ids, so one 3-wide slice per
row could cut descriptors 3x. A vmapped dynamic_slice formulation was
measured 6x WORSE (bad lowering); this probe tries the direct lax.gather
formulation with slice_sizes=(3,) before concluding the idea is dead.

Run on the real TPU: python tools/probe_gather.py [table_mb]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def timeit(fn, fence, k_lo=10, k_hi=50):
    fn(); fence()
    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        fence()
        return time.perf_counter() - t0
    run(5)
    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    table_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 378
    n_cells = table_mb * 1024 * 1024 // 4
    n_rows = 180_000               # 20k voxels x 9 kernel rows
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(-1, 20000, n_cells, dtype=np.int32))
    base = jnp.asarray(rng.randint(0, n_cells - 3, n_rows, dtype=np.int32))

    @jax.jit
    def elementwise(t, b):
        out = 0
        for d in range(3):
            out = out + t[b + d]
        return out.sum()

    @jax.jit
    def slice3(t, b):
        g = lax.gather(
            t, b[:, None],
            lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
            slice_sizes=(3,), mode=lax.GatherScatterMode.CLIP)
        return g.sum()

    for name, fn in (("element x3", elementwise), ("slice3", slice3)):
        out = fn(table, base)
        t = timeit(lambda: fn(table, base), lambda: float(fn(table, base)))
        per_q = t / (3 * n_rows) * 1e9
        print(f"{name:>12}: {t * 1e3:7.3f} ms  ({per_q:5.2f} ns per element,"
              f" {3 * n_rows} elements) [check {int(out)}]")


if __name__ == "__main__":
    main()
