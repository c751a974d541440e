"""Measure the primitives the rulebook chain is built from, in isolation:

  - jnp.sort of n int32 keys        (conv_out_coords dedup)
  - jnp.argsort + take of n rows    (stage_lookup reorder)
  - n-element scatter (.at[].set)   (compaction)
  - cumsum over an m-cell grid      (bitmap base / dense-rank designs)
  - (D,H,W) -> (H,W,D) transpose + z-bit pack (dense-grid bitmap design)

Sizes chosen at the SECOND stage operating points (V=20k: candidates
8V=160k, grid 11.8M) and the round-2 sort-join scale (560k).

Run: python tools/probes/probe_sortcost.py
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

    rng = np.random.RandomState(0)

    for n in (20_000, 160_000, 560_000):
        keys = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.int32))
        f = jax.jit(jnp.sort)
        t = timeit(lambda: f(keys), lambda: float(f(keys)[0]))
        print(f"sort       n={n:>7}: {t*1e3:7.3f} ms")

        f2 = jax.jit(lambda k: jnp.argsort(k).astype(jnp.int32))
        t = timeit(lambda: f2(keys), lambda: float(f2(keys)[0]))
        print(f"argsort    n={n:>7}: {t*1e3:7.3f} ms")

    v = 20_000
    rows = jnp.asarray(rng.randn(v, 64).astype(np.float32))
    perm = jnp.asarray(rng.permutation(v).astype(np.int32))
    f3 = jax.jit(lambda r, p: jnp.take_along_axis(r, p[:, None], axis=0))
    t = timeit(lambda: f3(rows, perm), lambda: float(f3(rows, perm)[0, 0]))
    print(f"take 20k rows C=64   : {t*1e3:7.3f} ms")

    n, m = 160_000, 11_800_000
    idx = jnp.asarray(rng.randint(0, m, n).astype(np.int32))
    vals = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.int32))
    f4 = jax.jit(lambda i, x: jnp.zeros((m,), jnp.int32).at[i].max(
        x, mode="drop"))
    t = timeit(lambda: f4(idx, vals), lambda: float(f4(idx, vals)[0]))
    print(f"scatter-max 160k->11.8M: {t*1e3:7.3f} ms")

    big = jnp.asarray(rng.randint(0, 2, m).astype(np.int32))
    f5 = jax.jit(jnp.cumsum)
    t = timeit(lambda: f5(big), lambda: float(f5(big)[-1]))
    print(f"cumsum 11.8M         : {t*1e3:7.3f} ms")

    do, ho, wo = 21, 800, 704
    grid = jnp.asarray(rng.randint(0, 2, (do, ho, wo)).astype(np.int32))

    @jax.jit
    def zpack(g):
        gy = g.transpose(1, 2, 0).astype(jnp.uint32)
        bits = (gy << jnp.arange(do, dtype=jnp.uint32)[None, None]).sum(-1)
        counts = g.sum(0).reshape(-1)
        base = jnp.cumsum(counts) - counts
        return bits, base

    t = timeit(lambda: zpack(grid), lambda: float(zpack(grid)[1][-1]))
    print(f"transpose+zpack 21x800x704: {t*1e3:7.3f} ms")

    # element gather baseline at candidate scale
    tab = jnp.asarray(rng.randint(0, 1 << 30, m).astype(np.int32))
    f6 = jax.jit(lambda t_, i: t_[i])
    t = timeit(lambda: f6(tab, idx), lambda: float(f6(tab, idx)[0]))
    print(f"gather 160k from 11.8M : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
