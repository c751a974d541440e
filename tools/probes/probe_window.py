"""Microbenchmark: rank-contiguous (3, C) window gathers vs 3 row gathers.

The bitmap rank CONTRACT (ops/sparse.py: rows in yxz order) makes each BEV
kernel column's actives a contiguous rank range, so the kz=3 z-taps of one
BEV neighbor column can be fetched as ONE (3, C) window at the column's
first-tap rank instead of 3 independent element-indexed row gathers. If a
window descriptor costs < 3x a row descriptor, a 3x3x3 subm conv drops
from 24 row gathers (27 - 3 center shifts) to 8 windows + shifts.

Measures, at SECOND res0 scale and CBGS scale:
  a. 3 separate row gathers (take_along_axis) + GEMM  [current design]
  b. 1 (3, C) window gather (lax.gather) + where-select + GEMM
  c. full-conv comparison: 24-tap scan  vs  8-window scan (+center shifts)

Run on the real TPU: python tools/probe_window.py
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

    for b, v, c, cout, tag in ((2, 20000, 16, 16, "SECOND res0"),
                               (2, 20000, 64, 64, "SECOND res2"),
                               (2, 60000, 16, 16, "CBGS res0"),
                               (2, 60000, 64, 64, "CBGS res2")):
        feats = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
        # per-(voxel, bev-column): window base rank + 3 presence bits
        r0 = jnp.asarray(rng.randint(0, v - 3, (b, v, 8), dtype=np.int32))
        pres = jnp.asarray(rng.rand(b, v, 8, 3) < 0.5)
        # flat per-tap idx/mask for the 24 gathered taps (current design)
        idx24 = jnp.asarray(rng.randint(0, v, (b, v, 24), dtype=np.int32))
        m24 = jnp.asarray(rng.rand(b, v, 24) < 0.5)
        w24 = jnp.asarray(rng.randn(24, c, cout).astype(np.float32) * 0.05)
        w8 = w24[:24].reshape(8, 3, c, cout)

        @jax.jit
        def rows3(f, i, m, w):
            # one BEV column via 3 independent row gathers (current)
            out = 0.0
            for t in range(3):
                g = jnp.take_along_axis(f, i[:, :, t, None], axis=1)
                g = g * m[:, :, t, None].astype(f.dtype)
                out = out + jnp.einsum("boc,cd->bod", g, w[t],
                                       preferred_element_type=jnp.float32)
            return out.sum()

        def window_one(f, r, p, w):
            # f (V, C), r (V,), p (V, 3) -> (V, cout) via one (3, C) window
            g = lax.gather(
                f, r[:, None],
                lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                           collapsed_slice_dims=(),
                                           start_index_map=(0,)),
                slice_sizes=(3, f.shape[-1]),
                mode=lax.GatherScatterMode.CLIP)        # (V, 3, C)
            p0, p1, p2 = p[:, 0], p[:, 1], p[:, 2]
            f32 = f.dtype
            t0 = g[:, 0] * p0[:, None].astype(f32)
            w1 = jnp.where(p0[:, None], g[:, 1], g[:, 0])
            t1 = w1 * p1[:, None].astype(f32)
            off2 = p0.astype(jnp.int32) + p1.astype(jnp.int32)
            w2 = jnp.where((off2 == 2)[:, None], g[:, 2],
                           jnp.where((off2 == 1)[:, None], g[:, 1], g[:, 0]))
            t2 = w2 * p2[:, None].astype(f32)
            out = (jnp.einsum("oc,cd->od", t0, w[0],
                              preferred_element_type=jnp.float32)
                   + jnp.einsum("oc,cd->od", t1, w[1],
                                preferred_element_type=jnp.float32)
                   + jnp.einsum("oc,cd->od", t2, w[2],
                                preferred_element_type=jnp.float32))
            return out

        @jax.jit
        def win1(f, r, p, w):
            out = jax.vmap(window_one, in_axes=(0, 0, 0, None))(
                f, r[:, :, 0], p[:, :, 0], w[0])
            return out.sum()

        @jax.jit
        def conv24(f, i, m, w):
            # current: 24 gathered taps through a scan
            ig = i.transpose(2, 0, 1)
            mg = m.transpose(2, 0, 1)

            def body(acc, args):
                ik, mk, wk = args
                g = jnp.take_along_axis(f, ik[..., None], axis=1)
                g = g * mk[..., None].astype(f.dtype)
                return acc + jnp.einsum("boc,cd->bod", g, wk,
                                        preferred_element_type=jnp.float32), None

            init = jnp.zeros((b, v, cout), jnp.float32)
            out, _ = lax.scan(body, init, (ig, mg, w))
            return out.sum()

        @jax.jit
        def conv8win(f, r, p, w):
            # proposed: 8 BEV-column windows through a scan
            rg = r.transpose(2, 0, 1)                 # (8, B, V)
            pg = p.transpose(2, 0, 1, 3)              # (8, B, V, 3)

            def body(acc, args):
                rk, pk, wk = args
                out = jax.vmap(window_one, in_axes=(0, 0, 0, None))(
                    f, rk, pk, wk)
                return acc + out, None

            init = jnp.zeros((b, v, cout), jnp.float32)
            out, _ = lax.scan(body, init, (rg, pg, w))
            return out.sum()

        fence = lambda fn, *a: float(fn(*a))
        t_r3 = timeit(lambda: rows3(feats, idx24, m24, w24),
                      lambda: float(rows3(feats, idx24, m24, w24)))
        t_w1 = timeit(lambda: win1(feats, r0, pres, w8),
                      lambda: float(win1(feats, r0, pres, w8)))
        t_c24 = timeit(lambda: conv24(feats, idx24, m24, w24),
                       lambda: float(conv24(feats, idx24, m24, w24)))
        t_c8 = timeit(lambda: conv8win(feats, r0, pres, w8),
                      lambda: float(conv8win(feats, r0, pres, w8)))
        print(f"[{tag}] B={b} V={v} C={c}->{cout}")
        print(f"  one column : rows3 {t_r3*1e3:7.3f} ms   window "
              f"{t_w1*1e3:7.3f} ms   ({t_r3/t_w1:4.2f}x)")
        print(f"  full conv  : 24tap {t_c24*1e3:7.3f} ms   8win   "
              f"{t_c8*1e3:7.3f} ms   ({t_c24/t_c8:4.2f}x)")


if __name__ == "__main__":
    main()
