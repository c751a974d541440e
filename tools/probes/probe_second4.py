"""Per-stage cost of the SECOND middle by prefix ablation.

Reimplements SpMiddleFHD's stage structure inline with a ``stages`` knob;
the delta between consecutive prefixes is that stage's true cost inside
the fused program.

Run: python tools/probe_second4.py [batch]
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
    grid = (1408, 1600, 40)
    shape0 = (41, 1600, 1408)
    rng = np.random.RandomState(0)
    n_cells = shape0[0] * shape0[1] * shape0[2]
    lin = rng.choice(n_cells, v, replace=False)
    co = np.stack([lin // (shape0[1] * shape0[2]),
                   (lin // shape0[2]) % shape0[1],
                   lin % shape0[2]], -1).astype(np.int32)
    co = jnp.asarray(np.broadcast_to(co, (batch, v, 3)).copy())
    feats = jnp.asarray(rng.randn(batch, v, 4).astype(np.float32))
    # pre-create every weight OUTSIDE the traces (lazily-created constants
    # inside a jit leak tracers when reused across jits)
    ws = {}
    specs = [("s0a", 27, 4, 16), ("s0b", 27, 16, 16),
             ("d0", 27, 16, 32), ("d1", 27, 32, 64), ("d2", 27, 64, 64),
             ("dt4", 3, 64, 64)]
    for j in range(3):
        specs += [(f"s0{j}", 27, 32, 32), (f"s1{j}", 27, 64, 64),
                  (f"s2{j}", 27, 64, 64), (f"dt{j}", 27, 64, 64)]
    for name, k, cin, cout in specs:
        ws[name] = jnp.asarray(
            rng.randn(k, cin, cout).astype(np.float32) * 0.05)

    def w(name, k, cin, cout):
        if name not in ws:
            ws[name] = jnp.asarray(
                np.random.RandomState(7).randn(k, cin, cout)
                .astype(np.float32) * 0.05)
        return ws[name]

    def middle(f, coords, stages, dense_tail):
        order0, coords, lk0 = sp.stage_lookup_batch(coords, shape0)
        x = jnp.take_along_axis(f, order0[..., None], axis=1)
        sidx0, smask0 = sp.subm_rulebook_batch(coords, shape0, 3, lk0)
        x = jnp.maximum(sp.apply_conv(x, sidx0, smask0,
                                      w("s0a", 27, 4, 16)), 0)
        x = jnp.maximum(sp.apply_conv(x, sidx0, smask0,
                                      w("s0b", 27, 16, 16)), 0)
        if stages == 1:
            return x
        shape, lk, chans = shape0, lk0, 16
        downs = [(3, 2, 1, 32, 3), (3, 2, 1, 64, 3),
                 (3, 2, (0, 1, 1), 64, 3)]
        for si, (dk, dstr, dp, cout, nsub) in enumerate(downs):
            oshape = sp.out_spatial_shape(shape, dk, dstr, dp)
            oc, _ = jax.vmap(lambda c: sp.conv_out_coords(
                c, shape, dk, dstr, dp, v))(coords)
            is_last_sparse = dense_tail and si == 2
            if not is_last_sparse:
                _, oc, olk = sp.stage_lookup_batch(oc, oshape)
            didx, dmask = sp.conv_rulebook_batch(shape, oc, dk, dstr, dp,
                                                 lk)
            x = jnp.maximum(sp.apply_conv(
                x, didx, dmask, w(f"d{si}", 27, chans, cout)), 0)
            if is_last_sparse:
                coords, shape, chans = oc, oshape, cout
                break
            sidx, smask = sp.subm_rulebook_batch(oc, oshape, 3, olk)
            for j in range(nsub):
                x = jnp.maximum(sp.apply_conv(
                    x, sidx, smask, w(f"s{si}{j}", 27, cout, cout)), 0)
            coords, shape, lk, chans = oc, oshape, olk, cout
            if stages == 2 + si:
                return x
        if dense_tail:
            from det3d_tpu.models.backbones import _cover_mask, _occupancy
            occ = _occupancy(coords, shape)
            xd = sp.to_dense(x, coords, shape)
            kz, ky, kx = 3, 3, 3
            for j in range(3):
                wk = w(f"dt{j}", 27, chans, chans).reshape(
                    kz, ky, kx, chans, chans)
                xd = jax.lax.conv_general_dilated(
                    xd, wk, (1, 1, 1), [(1, 1)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                xd = jnp.maximum(xd, 0) * occ[..., None]
            wk = w("dt4", 3, chans, chans).reshape(3, 1, 1, chans, chans)
            xd = jax.lax.conv_general_dilated(
                xd, wk, (2, 1, 1), [(0, 0), (0, 0), (0, 0)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return jnp.maximum(xd, 0)
        return x

    prev = 0.0
    for stages, tail in [(1, False), (2, False), (3, False), (4, False),
                         (5, False), (5, True)]:
        name = f"stages<={stages}" + (" dense-tail" if tail else "")
        fjit = jax.jit(lambda f, c, s=stages, t=tail: middle(f, c, s, t))
        out = fjit(feats, co)
        t = timeit(lambda: fjit(feats, co),
                   lambda: float(fjit(feats, co).sum()))
        print(f"{name:>22}: {t * 1e3:8.2f} ms "
              f"(delta {max(t - prev, 0) * 1e3:7.2f} ms)")
        if not tail:
            prev = t


if __name__ == "__main__":
    main()
