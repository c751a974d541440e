"""Post-bitmap attribution of the SECOND middle.

Times the new primitives at res0 scale: stage_lookup (argsort + reorder +
bitmap build), bitmap subm queries, conv_out_coords, one conv layer, and
middle-minus-pieces deltas.

Run: python tools/probe_second3.py [batch]
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
    v = 20000
    shape = (41, 1600, 1408)
    rng = np.random.RandomState(0)
    n_cells = shape[0] * shape[1] * shape[2]
    lin = rng.choice(n_cells, v, replace=False)
    co = np.stack([lin // (shape[1] * shape[2]),
                   (lin // shape[2]) % shape[1],
                   lin % shape[2]], -1).astype(np.int32)
    co = jnp.asarray(np.broadcast_to(co, (batch, v, 3)).copy())
    feats = jnp.asarray(rng.randn(batch, v, 16).astype(np.float32))

    # stage_lookup (argsort + reorder + bitmap build)
    s_jit = jax.jit(lambda c: sp.stage_lookup_batch(c, shape)[:2])
    t = timeit(lambda: s_jit(co), lambda: float(s_jit(co)[0].sum()))
    print(f"stage_lookup(argsort+build): {t * 1e3:7.2f} ms")

    def unpack(c):
        order, co_s, lookup = sp.stage_lookup_batch(c, shape)
        return (order, co_s) + tuple(lookup[1])

    order, co_s, tb_, tl_, th_ = jax.jit(unpack)(co)
    bm = (tb_, tl_, th_)

    # bitmap subm queries
    q_jit = jax.jit(lambda tb, tl, th, c: sp.subm_rulebook_bitmap(
        c, shape, 3, (tb, tl, th)))
    t = timeit(lambda: q_jit(*bm, co_s),
               lambda: float(q_jit(*bm, co_s)[0].sum()))
    print(f"bitmap subm queries:         {t * 1e3:7.2f} ms")

    # conv_out_coords (stride-2 downsample position set)
    o_jit = jax.jit(lambda c: jax.vmap(
        lambda cc: sp.conv_out_coords(cc, shape, 3, 2, 1, v))(c)[0])
    t = timeit(lambda: o_jit(co_s), lambda: float(o_jit(co_s).sum()))
    print(f"conv_out_coords:             {t * 1e3:7.2f} ms")

    # one 16ch conv (res0's real channel width)
    idx, mask = q_jit(*bm, co_s)
    w16 = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32) * 0.1)
    c_jit = jax.jit(sp.apply_conv)
    comp_args = (feats, idx, mask, w16)
    t = timeit(lambda: c_jit(*comp_args),
               lambda: float(c_jit(*comp_args).sum()))
    print(f"conv 16ch:                   {t * 1e3:7.2f} ms")

    # to_dense at final resolution scale
    fshape = (2, 200, 176)
    co_f = jnp.asarray(np.stack([
        rng.randint(0, fshape[0], (batch, v)),
        rng.randint(0, fshape[1], (batch, v)),
        rng.randint(0, fshape[2], (batch, v))], -1).astype(np.int32))
    f64 = jnp.asarray(rng.randn(batch, v, 64).astype(np.float32))
    d_jit = jax.jit(lambda f, c: sp.to_dense(f, c, fshape))
    t = timeit(lambda: d_jit(f64, co_f),
               lambda: float(d_jit(f64, co_f).sum()))
    print(f"to_dense (final):            {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
