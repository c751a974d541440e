"""Banded gather-matmul submanifold conv (Pallas TPU kernel).

The window-rulebook subm conv is descriptor-bound: one (kz, C) slice-gather
per (row, side BEV column) = V x 8 DMA descriptors per conv (~6 ms/scan at
CBGS's 60k rows; the rulebooks themselves are already free under host
plans). But in yxz rank order the window targets are RANK-LOCAL (measured:
any 256-row block's present targets span <= 1320 ranks at CBGS res0, <= 666
at KITTI SECOND), so the fetch can be a blocked one-hot MATMUL: each block
of R rows fetches from the [lo_b, lo_b + S) band of the feature array —
lo_b = the block's smallest present target rank — via onehot(r0 - lo_b) @
band_slice. One 1.0 per one-hot row makes the product EXACTLY the gathered
row (the single nonzero contributes x*1.0 and every other term is 0*x), so
the conv output equals the gather path's up to fp32 accumulation order.

An XLA formulation loses 0.6x (tools/probes/probe_bandmm.py: the one-hot
materializes ~2 GB/conv to HBM). This kernel generates the one-hot in VMEM
and consumes it immediately on the MXU: per grid block it runs Kc
(R, S)@(S, kz*C) fetch matmuls, routes taps with the same presence-popcount
ladder as ops/sparse.py::_window_taps, packs taps into an (R, Kc*kz*C)
buffer, and applies the weights as one (R, Kc*kz*C)@(Kc*kz*C, Cout) GEMM.
Measured (v5e, B=2, V=60k, C=16): 11.8 -> 5.1 ms per conv vs the gather
path (probe_bandmm).

Exactness contract: every present target must satisfy r0 - lo_b < S for
its block, where lo_b is the block's min present r0. ``certify_plan_bands``
checks this on the host plan; apis.train.host_plan_fn raises when a scan
exceeds the configured bucket (raise the middle's ``serve_band``).

Serving-path only (predict / plan-fed eval forward): training falls back
to the gather path with its custom VJPs (callers pass band=None for train).

Reference analogue: spconv's gather-GEMM (det3d/models/backbones/
scn.py:92-197 delegates to spconv); the banded formulation has no
reference twin — it exists because TPU gathers are descriptor-rate-bound
while the MXU is effectively free at these sizes (DESIGN_NOTES section 4, 11).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PACK_SHIFT = 24
_PACK_MASK = (1 << _PACK_SHIFT) - 1


def _band_kernel(packed_ref, xs_ref, w_ref, out_ref, buf_ref, *,
                 R, S, Kc, kz, C):
    """One (sample, row-block): fetch + route + weight-GEMM.

    packed_ref: (1, R, Kc) int32 — block-local loc | presence << 24
                (side columns only; absent windows carry loc == S)
    xs_ref:     (1, 1, S, kz*C)  — the block's band slice of super-rows
    w_ref:      (Kc*kz*C, Cout)  — side-column weights, (k, j, c) row order
    out_ref:    (1, R, Cout) f32 — side-column contribution
    buf_ref:    (R, Kc*kz*C) f32 scratch — routed taps
    """
    packed = packed_ref[0]                                   # (R, Kc)
    loc_all = packed & _PACK_MASK
    xs = xs_ref[0, 0]                                        # (S, kz*C)
    dt = xs.dtype
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    for k in range(Kc):
        loc = loc_all[:, k][:, None]                         # (R, 1)
        oh = (iota == loc).astype(dt)                        # (R, S)
        g = jnp.dot(oh, xs, preferred_element_type=jnp.float32)
        # presence-popcount ladder (twin of sparse.py::_window_taps)
        pres = [((packed[:, k] >> (_PACK_SHIFT + j)) & 1)
                for j in range(kz)]
        off = pres[0] * 0
        for j in range(kz):
            sel = g[:, 0:C]
            for m in range(1, j + 1):
                sel = jnp.where((off == m)[:, None],
                                g[:, m * C:(m + 1) * C], sel)
            tap = sel * pres[j][:, None].astype(jnp.float32)
            buf_ref[:, (k * kz + j) * C:(k * kz + j + 1) * C] = tap
            off = off + pres[j]
    out_ref[0] = jnp.dot(buf_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32)


def _center_contrib(features, pres_cc, w_cc):
    """Center BEV column via rank shifts (zero gathers) — identical to the
    gather path's _center_taps contribution."""
    out = None
    kz = pres_cc.shape[-1]
    for j, d in enumerate(range(-(kz // 2), kz // 2 + 1)):
        if d == 0:
            g = features
        elif d < 0:
            g = jnp.pad(features, ((0, 0), (-d, 0), (0, 0)))[:, :d]
        else:
            g = jnp.pad(features, ((0, 0), (0, d), (0, 0)))[:, d:]
        tap = g * pres_cc[..., j, None].astype(features.dtype)
        y = jnp.einsum("boc,cd->bod", tap, w_cc[j],
                       preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out


@functools.partial(jax.jit, static_argnames=("band", "block_rows",
                                             "interpret"))
def band_window_conv(features, r0, pres, weights, band: int,
                     block_rows: int = 256, interpret: bool = False):
    """Subm window conv with banded one-hot matmul side-column fetch.

    Drop-in for sparse.py::_window_conv_impl(center_shift=True): the center
    column rides rank shifts, the side columns ride the Pallas kernel.

    features: (B, V, C); r0: (B, V, K) int32; pres: (B, V, K, kz) bool;
    weights: (kz*K, Cin, Cout) z-major. ``band`` is the certified band
    bucket: every present window of every block_rows-row block must have
    r0 - (block's min present r0) < band (certify_plan_bands). Returns
    (B, V, Cout) float32.
    """
    B, V, C = features.shape
    K = r0.shape[-1]
    kz = pres.shape[-1]
    cout = weights.shape[-1]
    R = block_rows
    S = int(np.ceil(band / 128) * 128)
    cc = K // 2
    cols = np.asarray([c for c in range(K) if c != cc], np.int32)
    Kc = len(cols)

    wdt = weights.dtype
    w_cols = weights.reshape(kz, K, C, cout).transpose(1, 0, 2, 3)
    out = _center_contrib(features, pres[:, :, cc], w_cols[cc])

    # super-rows xw[v] = [x[v], x[v+1], ..., x[v+kz-1]]; kz-1 zero rows give
    # clamped windows the gather path's CLIP-at-padding behavior
    fpad = jnp.pad(features, ((0, 0), (0, kz - 1), (0, 0)))
    xw = jnp.concatenate([fpad[:, j:j + V] for j in range(kz)], axis=-1)

    nb = -(-V // R)
    Vp = nb * R
    r0s = r0[:, :, cols]
    press = pres[:, :, cols]
    r0p = jnp.pad(r0s, ((0, 0), (0, Vp - V), (0, 0)))
    presp = jnp.pad(press, ((0, 0), (0, Vp - V), (0, 0), (0, 0)))
    pany = presp.any(-1)                                     # (B, Vp, Kc)

    # per-block base: the smallest present target rank in the block
    r0b = r0p.reshape(B, nb, R * Kc)
    panyb = pany.reshape(B, nb, R * Kc)
    lo = jnp.min(jnp.where(panyb, r0b, V), axis=-1)          # (B, nb)
    # xs slice source: xw padded with S trailing zero rows so any start in
    # [0, V + kz - 1] yields an in-bounds (S,) slice without clamping
    xpad = jnp.pad(xw, ((0, 0), (0, S), (0, 0)))
    lo = jnp.minimum(lo, V + kz - 1).astype(jnp.int32)
    xs = jax.vmap(lambda xp, st: jax.vmap(
        lambda s: jax.lax.dynamic_slice(xp, (s, 0), (S, xw.shape[-1])))(
            st))(xpad, lo)                                   # (B, nb, S, kzC)

    loc = r0b - lo[:, :, None]                               # block-local
    loc = jnp.where(panyb, loc, S).reshape(B, Vp, Kc)        # absent: no hit
    pbits = jnp.zeros(presp.shape[:-1], jnp.int32)
    for j in range(kz):
        pbits = pbits | (presp[..., j].astype(jnp.int32) << j)
    packed = (loc & _PACK_MASK) | (pbits << _PACK_SHIFT)

    w_band = w_cols[cols].reshape(Kc * kz * C, cout)         # (k, j, c) rows

    side = pl.pallas_call(
        functools.partial(_band_kernel, R=R, S=S, Kc=Kc, kz=kz, C=C),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, R, Kc), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, kz * C), lambda b, n: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kc * kz * C, cout), lambda b, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, cout), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Vp, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, Kc * kz * C), jnp.float32)],
        interpret=interpret,
    )(packed, xs.astype(wdt), w_band)

    return out + side[:, :V]


def plan_band(packed, block_rows: int = 256):
    """Host/test helper: the band bucket a packed subm rulebook needs —
    max over block_rows-row blocks of (max - min present r0) + kz headroom.
    Accepts the packed plan array (V, K) or batched (B, V, K) int32."""
    p = np.asarray(packed)
    if p.ndim == 2:
        p = p[None]
    from det3d_tpu import csrc
    lib = csrc.get_hostplan_lib()
    if lib is not None:
        # per sample: the kernel's blocks are aligned within each sample
        band = 0
        for s in range(p.shape[0]):
            pc = np.ascontiguousarray(p[s], np.int32)
            band = max(band, int(lib.hp_block_band(
                pc, pc.shape[0], pc.shape[1], block_rows)))
        return band + 4
    B, V, K = p.shape
    nb = -(-V // block_rows)
    p = np.pad(p, ((0, 0), (0, nb * block_rows - V), (0, 0)))
    r0 = (p & _PACK_MASK).reshape(B, nb, -1).astype(np.int64)
    pres = ((p >> _PACK_SHIFT) != 0).reshape(B, nb, -1)
    mx = np.where(pres, r0, -1).max(-1)
    mn = np.where(pres, r0, 1 << 40).min(-1)
    spread = np.where(mx >= 0, mx - mn, 0).max()
    return int(spread) + 4          # +kz headroom for the super-row window


def certify_plan_bands(plan, serve_band: int, block_rows: int = 256):
    """True iff every subm stage of a (host) packed plan fits the
    ``serve_band`` bucket band_window_conv was compiled with."""
    keys = [k for k in plan
            if k.startswith(("plan_s", "plan_subm")) or
            (k in ("s0",) or k.startswith("subm"))]
    return all(plan_band(plan[k], block_rows) <= serve_band for k in keys)
