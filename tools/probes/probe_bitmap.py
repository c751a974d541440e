"""Bitmap vs dense-table rulebook at KITTI SECOND res0 scale, real TPU.

Times (a) lookup build, (b) subm 27-tap queries, for both schemes.
Run: python tools/probe_bitmap.py [batch] [V]
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
    from det3d_tpu.ops import sparse as sp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    shape = (41, 1600, 1408)
    rng = np.random.RandomState(0)
    n_cells = shape[0] * shape[1] * shape[2]
    lin = rng.choice(n_cells, v, replace=False)
    co = np.stack([lin // (shape[1] * shape[2]),
                   (lin // shape[2]) % shape[1],
                   lin % shape[2]], -1).astype(np.int32)
    co = jnp.asarray(np.broadcast_to(co, (batch, v, 3)).copy())
    order = jax.jit(jax.vmap(lambda c: sp.yxz_order(c, shape)))(co)
    co_s = jnp.take_along_axis(co, order[..., None], axis=1)

    # dense table
    b_dense = jax.jit(lambda c: sp.build_lookup_batch(c, shape)[1])
    t = timeit(lambda: b_dense(co_s), lambda: float(b_dense(co_s)[0, 0]))
    print(f"dense  build: {t * 1e3:7.2f} ms")
    table = b_dense(co_s)
    q_dense = jax.jit(lambda tb, c: sp.subm_rulebook_batch(
        c, shape, 3, ("dense", tb)))
    t = timeit(lambda: q_dense(table, co_s),
               lambda: float(q_dense(table, co_s)[0].sum()))
    print(f"dense  subm queries: {t * 1e3:7.2f} ms")

    # bitmap
    b_bm = jax.jit(lambda c: sp.build_bitmap_batch(c, shape))
    t = timeit(lambda: b_bm(co_s), lambda: float(b_bm(co_s)[0, 0]))
    print(f"bitmap build: {t * 1e3:7.2f} ms")
    bm = b_bm(co_s)
    q_bm = jax.jit(lambda ti, c: sp.subm_rulebook_bitmap(c, shape, 3, ti))
    t = timeit(lambda: q_bm(bm, co_s),
               lambda: float(q_bm(bm, co_s)[0].sum()))
    print(f"bitmap subm queries: {t * 1e3:7.2f} ms")

    # cross-check
    i1, m1 = q_dense(table, co_s)
    i2, m2 = q_bm(bm, co_s)
    assert np.array_equal(np.asarray(m1), np.asarray(m2))
    assert np.array_equal(np.asarray(i1)[np.asarray(m1)],
                          np.asarray(i2)[np.asarray(m2)])
    print("rulebooks identical")


if __name__ == "__main__":
    main()
