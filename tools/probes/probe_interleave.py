"""Microbenchmark: interleaved (base, lo) bitmap-table fetches.

Every window-rulebook column query fetches rank_base and bits_lo from two
parallel (h*w,) int32 tables = 2 element descriptors. Interleaving them
as one (h*w * 2,) table [base0, lo0, base1, lo1, ...] lets one (2,)-slice
descriptor fetch both. (3,)-slices measured a wash vs 3 elements
(probe_gather) but (2,)-slices vs 2 elements at rulebook-query volume is
untested — and unlike probe_gather's table-payload case these are 8-byte
fetches of genuinely adjacent words.

Run on the real TPU: python tools/probes/probe_interleave.py
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

    rng = np.random.RandomState(0)
    # KITTI SECOND res0 column-table scale: h*w = 1600*1408; queries =
    # B * V * 9 columns
    m = 1600 * 1408
    nq = 2 * 20000 * 9
    t_base = jnp.asarray(rng.randint(0, 20000, m, dtype=np.int32))
    t_lo = jnp.asarray(rng.randint(0, 2**31 - 1, m, dtype=np.int32))
    inter = jnp.stack([t_base, t_lo], axis=1).reshape(-1)   # (2m,)
    q = jnp.asarray(rng.randint(0, m, nq, dtype=np.int32))

    @jax.jit
    def two_tables(tb, tl, qq):
        return (tb[qq] + tl[qq]).sum()

    @jax.jit
    def slice2(ti, qq):
        g = lax.gather(
            ti, (qq * 2)[:, None],
            lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
            slice_sizes=(2,), mode=lax.GatherScatterMode.CLIP)
        return (g[:, 0] + g[:, 1]).sum()

    @jax.jit
    def table2d(ti, qq):
        t2 = ti.reshape(-1, 2)
        return t2[qq].sum()

    # d > 32 case (SECOND/CBGS res0, d=41): 3 words per column. Compare
    # 3 element gathers vs one (4,)-slice of a padded-to-4 interleave
    # [base, lo, hi, 0] (power-of-2 stride keeps addressing cheap).
    t_hi = jnp.asarray(rng.randint(0, 2**31 - 1, m, dtype=np.int32))
    inter4 = jnp.stack(
        [t_base, t_lo, t_hi, jnp.zeros_like(t_base)], axis=1).reshape(-1)

    @jax.jit
    def three_tables(tb, tl, th, qq):
        return (tb[qq] + tl[qq] + th[qq]).sum()

    @jax.jit
    def slice4(ti, qq):
        g = lax.gather(
            ti, (qq * 4)[:, None],
            lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
            slice_sizes=(4,), mode=lax.GatherScatterMode.CLIP)
        return (g[:, 0] + g[:, 1] + g[:, 2]).sum()

    # vmapped variants — the rulebook builders run their fetches under
    # jax.vmap over the batch; element gathers measured vmap-safe, but
    # slice gathers may lower differently with a batch dim.
    b = 2
    t_base_b = jnp.stack([t_base] * b)
    t_lo_b = jnp.stack([t_lo] * b)
    inter_b = jnp.stack([inter] * b)
    q_b = q.reshape(b, -1)

    @jax.jit
    def vm_two(tb, tl, qq):
        return jax.vmap(lambda a, c, d_: (a[d_] + c[d_]).sum())(
            tb, tl, qq).sum()

    @jax.jit
    def vm_slice2(ti, qq):
        def one(t, d_):
            g = lax.gather(
                t, (d_ * 2)[:, None],
                lax.GatherDimensionNumbers(offset_dims=(1,),
                                           collapsed_slice_dims=(),
                                           start_index_map=(0,)),
                slice_sizes=(2,), mode=lax.GatherScatterMode.CLIP)
            return (g[:, 0] + g[:, 1]).sum()
        return jax.vmap(one)(ti, qq).sum()

    @jax.jit
    def flat_slice2(ti, qq):
        m_ = ti.shape[1] // 2
        tf = ti.reshape(-1)
        qf = (qq + (jnp.arange(b, dtype=jnp.int32) * m_)[:, None]
              ).reshape(-1)
        g = lax.gather(
            tf, (qf * 2)[:, None],
            lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
            slice_sizes=(2,), mode=lax.GatherScatterMode.CLIP)
        return (g[:, 0] + g[:, 1]).sum()

    for name, fn, args in (
            ("2 tables", two_tables, (t_base, t_lo, q)),
            ("slice2  ", slice2, (inter, q)),
            ("2d table", table2d, (inter, q)),
            ("3 tables", three_tables, (t_base, t_lo, t_hi, q)),
            ("slice4  ", slice4, (inter4, q)),
            ("vmap 2 tables", vm_two, (t_base_b, t_lo_b, q_b)),
            ("vmap slice2  ", vm_slice2, (inter_b, q_b)),
            ("flat slice2  ", flat_slice2, (inter_b, q_b))):
        out = fn(*args)
        t = timeit(lambda: fn(*args), lambda: float(fn(*args)))
        print(f"{name}: {t*1e3:7.3f} ms  ({t/nq*1e9:5.2f} ns/query)"
              f" [check {int(out)}]")


if __name__ == "__main__":
    main()
