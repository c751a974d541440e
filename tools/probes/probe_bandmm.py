"""Banded one-hot gather-matmul vs slice-gather window conv (round 5).

The sparse middles' window convs are descriptor-bound: one (kz, C)
slice-gather per (row, BEV side column) — V*8 DMA descriptors per subm
conv. But in yxz rank order the window targets are RANK-LOCAL (measured
CBGS res0: max |r0 - row| = 291), so the fetch can instead be a blocked
one-hot MATMUL: rows in blocks of R fetch from a [blk*R - D, blk*R + R + D)
band slice via onehot(r0_local) @ band — MXU work instead of descriptors,
and exactly equal (each one-hot row has a single 1.0; products and the
single-nonzero sum are exact in fp32/bf16).

Compares, at CBGS res0 / stage1 / SECOND scales:
  a) sp.apply_conv window path (slice gathers, the current production path)
  b) XLA band-matmul (jnp.einsum over materialized one-hot)
for the full subm conv (center column via rank shifts in both).

Run: python tools/probes/probe_bandmm.py
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


def band_window_conv(features, r0, pres, weights, D, R=256,
                     center_shift=True):
    """Subm window conv with band-matmul tap fetch (XLA formulation)."""
    import jax
    import jax.numpy as jnp
    from det3d_tpu.ops import sparse as sp

    B, V, C = features.shape
    K = r0.shape[-1]
    kz = pres.shape[-1]
    cout = weights.shape[-1]
    w_cols = weights.reshape(kz, K, C, cout).transpose(1, 0, 2, 3)
    cc = K // 2
    cols = np.asarray([c for c in range(K)
                       if not (center_shift and c == cc)], np.int32)

    out = jnp.zeros((B, V, cout), jnp.float32)
    if center_shift:
        for j, tap in enumerate(sp._center_taps(features, pres[:, :, cc])):
            out = out + jnp.einsum("boc,cd->bod", tap, w_cols[cc, j],
                                   preferred_element_type=jnp.float32)

    Kc = len(cols)
    # super-rows: xw[v] = [x[v], x[v+1], ..., x[v+kz-1]] (kz-1 zero rows pad)
    fpad = jnp.pad(features, ((0, 0), (0, kz - 1), (0, 0)))
    xw = jnp.concatenate([fpad[:, j:j + V] for j in range(kz)], axis=-1)

    nb = -(-V // R)
    Vp = nb * R
    S = R + 2 * D
    xpad = jnp.pad(xw, ((0, 0), (D, D + Vp - V), (0, 0)))   # row v -> v + D
    starts = jnp.arange(nb, dtype=jnp.int32) * R
    xs = jax.vmap(lambda xp: jax.vmap(
        lambda s: jax.lax.dynamic_slice(xp, (s, 0), (S, xw.shape[-1])))(
            starts))(xpad)                                   # (B, nb, S, kzC)

    r0c = jnp.minimum(r0[:, :, cols], V - 1)
    r0p = jnp.pad(r0c, ((0, 0), (0, Vp - V), (0, 0)))
    local = (r0p.reshape(B, nb, R, Kc)
             - (starts[None, :, None, None] - D))
    local = jnp.clip(local, 0, S - 1)
    oh = jax.nn.one_hot(local.reshape(B, nb, R * Kc), S,
                        dtype=features.dtype)
    g = jnp.einsum("bnks,bnsc->bnkc", oh, xs,
                   preferred_element_type=jnp.float32)
    g = g.reshape(B, Vp, Kc, kz, C)[:, :V]                   # (B, V, Kc, kz, C)

    p_s = pres[:, :, cols]                                   # (B, V, Kc, kz)
    pint = p_s.astype(jnp.int32)
    cum = jnp.cumsum(pint, axis=-1) - pint                   # excl. popcount
    for j in range(kz):
        sel = g[..., 0, :]
        for m in range(1, j + 1):
            sel = jnp.where((cum[..., j] == m)[..., None], g[..., m, :], sel)
        tap = sel * p_s[..., j, None].astype(sel.dtype)      # (B, V, Kc, C)
        out = out + jnp.einsum("bvkc,kcd->bvd", tap, w_cols[cols, j],
                               preferred_element_type=jnp.float32)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from det3d_tpu.ops import sparse as sp

    rng = np.random.default_rng(0)

    def make_case(name, B, V, C, cout, shape, occupancy_cols):
        """Synthetic rank-ordered coords on a (d, h, w) grid with ~V actives
        clustered like a lidar sweep (limits |r0 - row| like real scans)."""
        d, h, w = shape
        n = V
        # scatter voxels roughly uniformly over BEV with 1-2 per column
        cols = rng.choice(h * w, size=occupancy_cols, replace=False)
        cols = np.sort(cols)
        zs = rng.integers(0, min(d, 3), size=occupancy_cols)
        co = np.stack([zs, cols // w, cols % w], 1).astype(np.int32)[:n]
        if co.shape[0] < n:
            co = np.concatenate(
                [co, np.full((n - co.shape[0], 3), -1, np.int32)])
        # yxz rank order
        key = (co[:, 1].astype(np.int64) * w + co[:, 2]) * d + co[:, 0]
        key[co[:, 0] < 0] = np.iinfo(np.int64).max
        co = co[np.argsort(key, kind="stable")]
        cob = jnp.asarray(np.stack([co] * B))
        lookup = ("bitmap", sp.build_bitmap_batch(cob, shape))
        r0, pres = sp.subm_window_rulebook_batch(cob, shape, 3, lookup)
        x = jnp.asarray(rng.standard_normal((B, n, C)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((27, C, cout)) * 0.1,
                          jnp.float32)
        band = int(np.abs(np.asarray(r0[0]).astype(np.int64)
                          - np.arange(n)[:, None])[
                              np.asarray(pres[0]).any(-1)].max())
        return name, x, r0, pres, wgt, band

    cases = [
        make_case("cbgs_res0 C=16", 2, 60000, 16, 16, (41, 1024, 1024),
                  55000),
        make_case("cbgs_res1 C=32", 2, 60000, 32, 32, (21, 512, 512), 50000),
        make_case("second_res0 C=16", 2, 20000, 16, 16, (41, 1600, 1408),
                  19000),
    ]

    from det3d_tpu.ops.band_conv import band_window_conv as band_pallas

    # production band buckets (measured per-block spreads on structured
    # scans: CBGS s0 <= 1320, subm1 <= 867; SECOND <= 666): the probe times
    # the kernel at the bucket it would actually be compiled with
    buckets = {"cbgs_res0 C=16": 1536, "cbgs_res1 C=32": 1024,
               "second_res0 C=16": 768}

    zt = sp.center_column_taps(3)
    for name, x, r0, pres, wgt, band in cases:
        D = int(np.ceil((band + 32) / 64) * 64)
        S = buckets[name]
        base_f = jax.jit(lambda x, r0, pres, w: sp.apply_conv(
            x, r0, pres, w, z_shift_taps=zt))
        band_f = jax.jit(lambda x, r0, pres, w: band_window_conv(
            x, r0, pres, w, D))
        pallas_f = jax.jit(lambda x, r0, pres, w: band_pallas(
            x, r0, pres, w, band=S))
        pallas_bf_f = jax.jit(lambda x, r0, pres, w: band_pallas(
            x.astype(jnp.bfloat16), r0, pres, w.astype(jnp.bfloat16),
            band=S))
        y_base = np.asarray(base_f(x, r0, pres, wgt))
        y_band = np.asarray(band_f(x, r0, pres, wgt))
        y_pal = np.asarray(pallas_f(x, r0, pres, wgt))
        err = np.abs(y_base - y_band).max() / (np.abs(y_base).max() + 1e-9)
        errp = np.abs(y_base - y_pal).max() / (np.abs(y_base).max() + 1e-9)
        out = [None]
        def fb():
            out[0] = base_f(x, r0, pres, wgt)
        def fn():
            out[0] = band_f(x, r0, pres, wgt)
        def fp():
            out[0] = pallas_f(x, r0, pres, wgt)
        def fpb():
            out[0] = pallas_bf_f(x, r0, pres, wgt)
        def fence():
            float(out[0].sum())
        t_base = timeit(fb, fence)
        t_band = timeit(fn, fence)
        t_pal = timeit(fp, fence)
        t_palb = timeit(fpb, fence)
        print(f"{name}: band={band} D={D} S={S} rel_err={err:.2e}/{errp:.2e} "
              f"gather={t_base*1e3:.2f} ms  xla-bandmm={t_band*1e3:.2f} ms "
              f"({t_base/t_band:.2f}x)  pallas={t_pal*1e3:.2f} ms "
              f"({t_base/t_pal:.2f}x)  pallas-bf16={t_palb*1e3:.2f} ms "
              f"({t_base/t_palb:.2f}x)")


if __name__ == "__main__":
    main()
