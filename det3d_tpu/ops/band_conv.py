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


def _band_kernel(lo_ref, packed_ref, x_any, w_ref, out_ref, xband_ref,
                 buf_ref, sems, *, R, S, Kc, kz, C, NB, nsteps,
                 offs_ref=None, Sc=None):
    """One (sample, row-block) on a FLAT grid step bn = b * NB + n:
    band DMA (double-buffered across grid steps) + fetch + route +
    weight-GEMM.

    lo_ref:     (B, NB) int32 SMEM — per-block band start row in x
    packed_ref: (1, R, Kc) int32 — block-local loc | presence << 24
                (side columns only; absent windows carry loc == S)
    x_any:      (B, V + kz - 1 + S + 8, kz*C) in HBM (memory_space=ANY) —
                padded super-rows; the kernel DMAs its own (S, kz*C) band
                per block. (The previous formulation shipped the band as a
                pipelined VMEM input, which required the caller to
                materialize every block's slice with XLA dynamic-slices:
                470 slice+copy ops PER CONV at CBGS scale — the op soup
                was ~2x the kernel's own time; see DESIGN_NOTES §11.)
    w_ref:      (Kc*kz*C, Cout)  — side-column weights, (k, j, c) row order
    out_ref:    (1, R, Cout) f32 — side-column contribution
    xband_ref:  (2, S, kz*C) VMEM scratch — double-buffered band slots
    buf_ref:    (R, Kc*kz*C) f32 scratch — routed taps
    sems:       (2,) DMA semaphores, one per slot
    offs_ref:   (B, NB, Kc) int32 SMEM (col-band mode) — per-column start
                of the Sc-row sub-band inside the block's S-row slice; loc
                in ``packed`` is then relative to its column's sub-band
    """
    bn = pl.program_id(0)
    b, n = bn // NB, bn % NB

    def dma(i, slot):
        # band_prep aligns lo down to 8; multiple_of carries the proof
        # Mosaic needs for the sublane-tiled HBM slice
        return pltpu.make_async_copy(
            x_any.at[i // NB,
                     pl.ds(pl.multiple_of(lo_ref[i // NB, i % NB], 8), S),
                     :],
            xband_ref.at[slot], sems.at[slot])

    @pl.when(bn == 0)
    def _():
        dma(0, 0).start()

    @pl.when(bn + 1 < nsteps)
    def _():
        dma(bn + 1, (bn + 1) % 2).start()

    dma(bn, bn % 2).wait()
    slot = bn % 2

    packed = packed_ref[0]                                   # (R, Kc)
    loc_all = packed & _PACK_MASK
    dt = x_any.dtype
    Sd = S if offs_ref is None else Sc
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, Sd), 1)
    for k in range(Kc):
        src = (xband_ref[slot] if offs_ref is None
               else xband_ref[slot,
                              pl.ds(pl.multiple_of(offs_ref[b, n, k], 8),
                                    Sc), :])
        loc = loc_all[:, k][:, None]                         # (R, 1)
        oh = (iota == loc).astype(dt)                        # (R, Sd)
        g = jnp.dot(oh, src, preferred_element_type=jnp.float32)
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
                                             "col_band", "center_shift"))
def band_prep(r0, pres, band: int, block_rows: int = 256, col_band=None,
              center_shift: bool = True):
    """The plan-pure half of band_window_conv: block-local one-hot
    locations (packed with presence bits), per-(block, column) sub-band
    starts, and per-block band bases — a function of the RULEBOOK only,
    shared by every conv on it. Measured 0.92 ms per evaluation at CBGS
    res0 (probe_tail_attrib); hoisting it once per rulebook saves ~7
    redundant evaluations per CBGS forward (5 s0 convs + 4 subm1 convs
    share two rulebooks).

    Returns (packed (B, Vp, Kc) int32, offs (B, nb, Kc) int32 | None,
    lo (B, nb) int32) for band_window_conv(prep=...). The ``band``,
    ``block_rows``, ``col_band`` and ``center_shift`` values must match
    the conv call's."""
    B, V, K = r0.shape
    kz = pres.shape[-1]
    R = block_rows
    S = int(np.ceil(band / 128) * 128)
    cc = K // 2
    cols = np.asarray([c for c in range(K)
                       if not (center_shift and c == cc)], np.int32)
    Kc = len(cols)
    O = r0.shape[1]
    nb = -(-O // R)
    Vp = nb * R
    r0s = r0[:, :, cols]
    press = pres[:, :, cols]
    r0p = jnp.pad(r0s, ((0, 0), (0, Vp - O), (0, 0)))
    presp = jnp.pad(press, ((0, 0), (0, Vp - O), (0, 0), (0, 0)))
    pany = presp.any(-1)                                     # (B, Vp, Kc)

    # per-block base: the smallest present target rank in the block
    r0b = r0p.reshape(B, nb, R * Kc)
    panyb = pany.reshape(B, nb, R * Kc)
    lo = jnp.min(jnp.where(panyb, r0b, V), axis=-1)          # (B, nb)
    # 8-row aligned: the in-kernel HBM->VMEM band DMA requires a sublane-
    # tile-aligned start (Mosaic); loc grows by <= 7 (plan_band headroom)
    lo = (jnp.minimum(lo, V + kz - 1) & ~7).astype(jnp.int32)

    offs = None
    if col_band is not None:
        Sc = int(np.ceil(col_band / 128) * 128)
        # per-(block, column) base, 8-row aligned inside the block slice
        r0k = r0p.reshape(B, nb, R, Kc)
        pak = pany.reshape(B, nb, R, Kc)
        lok = jnp.min(jnp.where(pak, r0k, V), axis=2)        # (B, nb, Kc)
        offs = jnp.clip((lok - lo[:, :, None]) & ~7, 0, S - Sc)
        offs = offs.astype(jnp.int32)
        base = lo[:, :, None] + offs                         # (B, nb, Kc)
        loc = (r0k - base[:, :, None, :]).reshape(B, nb, R * Kc)
        loc = jnp.where(panyb, loc, Sc).reshape(B, Vp, Kc)
    else:
        loc = r0b - lo[:, :, None]                           # block-local
        loc = jnp.where(panyb, loc, S).reshape(B, Vp, Kc)    # absent: no hit
    pbits = jnp.zeros(presp.shape[:-1], jnp.int32)
    for j in range(kz):
        pbits = pbits | (presp[..., j].astype(jnp.int32) << j)
    packed = (loc & _PACK_MASK) | (pbits << _PACK_SHIFT)
    return packed, offs, lo


@functools.partial(jax.jit, static_argnames=("band", "block_rows",
                                             "col_band", "center_shift",
                                             "interpret"))
def band_window_conv(features, r0, pres, weights, band: int,
                     block_rows: int = 256, col_band=None,
                     center_shift: bool = True,
                     interpret: bool = False, prep=None):
    """Subm window conv with banded one-hot matmul side-column fetch.

    Drop-in for sparse.py::_window_conv_impl(center_shift=True): the center
    column rides rank shifts, the side columns ride the Pallas kernel.

    features: (B, V, C); r0: (B, V, K) int32; pres: (B, V, K, kz) bool;
    weights: (kz*K, Cin, Cout) z-major. ``band`` is the certified band
    bucket: every present window of every block_rows-row block must have
    r0 - (block's min present r0) < band (certify_plan_bands). Returns
    (B, V, Cout) float32.

    ``col_band`` (static int <= band): per-BEV-column sub-bands. In yxz
    rank order r0 is MONOTONE in row rank for a fixed column offset, so a
    block's targets for ONE column span far fewer ranks than the block's
    union over all 8 (measured CBGS res0: 596 vs 1116). The block still
    ships one S-row slice, but each column's one-hot matmul runs against
    its own col_band-row sub-slice (8-row aligned start, from the column's
    min present target) — fetch FLOPs and one-hot generation scale with
    col_band instead of band. Exactness: per-column spread + 7 alignment
    + kz headroom must fit col_band (certify_plan_bands(col_band=...)).

    ``prep``: the (packed, offs, lo) triple from band_prep(r0, pres, ...)
    with identical band/block_rows/col_band/center_shift — callers with
    several convs on one rulebook hoist it; None recomputes inline.
    """
    B, V, C = features.shape
    O = r0.shape[1]
    K = r0.shape[-1]
    kz = pres.shape[-1]
    cout = weights.shape[-1]
    R = block_rows
    S = int(np.ceil(band / 128) * 128)
    cc = K // 2
    # center_shift=False (strided convs: output rows not rank-aligned with
    # inputs): every BEV column, the center included, rides the kernel
    cols = np.asarray([c for c in range(K)
                       if not (center_shift and c == cc)], np.int32)
    Kc = len(cols)

    wdt = weights.dtype
    w_cols = weights.reshape(kz, K, C, cout).transpose(1, 0, 2, 3)
    out = (_center_contrib(features, pres[:, :, cc], w_cols[cc])
           if center_shift else None)

    # super-rows xw[v] = [x[v], x[v+1], ..., x[v+kz-1]]; kz-1 zero rows give
    # clamped windows the gather path's CLIP-at-padding behavior
    fpad = jnp.pad(features, ((0, 0), (0, kz - 1), (0, 0)))
    xw = jnp.concatenate([fpad[:, j:j + V] for j in range(kz)], axis=-1)

    nb = -(-O // R)
    Vp = nb * R
    if prep is None:
        prep = band_prep(r0, pres, band, block_rows=block_rows,
                         col_band=col_band, center_shift=center_shift)
    packed, offs, lo = prep
    Sc = (None if col_band is None
          else int(np.ceil(col_band / 128) * 128))

    # DMA source: xw padded with S + 8 trailing zero rows so any band start
    # in [0, V + kz - 1] yields an in-bounds in-kernel (S,)-row DMA. The
    # lane (minor) dim pads to a 128 multiple — Mosaic requires DMA slices
    # lane-aligned, and the fetch dot's N dim was idling those lanes
    # anyway (same MXU cycles at N=48 and N=128; only DMA bytes grow).
    Cp = int(np.ceil(kz * C / 128) * 128)
    xpad = jnp.pad(xw, ((0, 0), (0, S + 8), (0, Cp - kz * C))).astype(wdt)

    w_band = w_cols[cols].reshape(Kc * kz * C, cout)         # (k, j, c) rows

    nsteps = B * nb
    scratch = [pltpu.VMEM((2, S, Cp), wdt),
               pltpu.VMEM((R, Kc * kz * C), jnp.float32),
               pltpu.SemaphoreType.DMA((2,))]

    if offs is not None:
        # per-block band starts + per-column sub-band starts ride as
        # scalar prefetch (SMEM); the band itself is DMA'd in-kernel from
        # the ANY-space xpad (see _band_kernel)
        def kern(lo_ref, o_ref, p_ref, x_ref, w_ref, out_ref, xband_ref,
                 buf_ref, sems):
            _band_kernel(lo_ref, p_ref, x_ref, w_ref, out_ref, xband_ref,
                         buf_ref, sems, R=R, S=S, Kc=Kc, kz=kz, C=C,
                         NB=nb, nsteps=nsteps, offs_ref=o_ref, Sc=Sc)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, R, Kc),
                             lambda bn, lo, o: (bn // nb, bn % nb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((Kc * kz * C, cout), lambda bn, lo, o: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, cout),
                                   lambda bn, lo, o: (bn // nb, bn % nb, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        side = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, Vp, cout), jnp.float32),
            interpret=interpret,
        )(lo, offs, packed, xpad, w_band)
        return side[:, :O] if out is None else out + side[:, :O]

    def kern(lo_ref, p_ref, x_ref, w_ref, out_ref, xband_ref, buf_ref,
             sems):
        _band_kernel(lo_ref, p_ref, x_ref, w_ref, out_ref, xband_ref,
                     buf_ref, sems, R=R, S=S, Kc=Kc, kz=kz, C=C,
                     NB=nb, nsteps=nsteps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, R, Kc),
                         lambda bn, lo: (bn // nb, bn % nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Kc * kz * C, cout), lambda bn, lo: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, cout),
                               lambda bn, lo: (bn // nb, bn % nb, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    side = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Vp, cout), jnp.float32),
        interpret=interpret,
    )(lo, packed, xpad, w_band)

    return side[:, :O] if out is None else out + side[:, :O]


def plan_band(packed, block_rows: int = 256, per_col: bool = False):
    """Host/test helper: the band bucket a packed subm rulebook needs —
    max over block_rows-row blocks of (max - min present r0) + kz headroom.
    ``per_col=True``: the per-BEV-column bucket instead (max over
    (block, column) of the column's own spread, + 7 alignment headroom)
    for band_window_conv(col_band=...). Accepts the packed plan array
    (V, K) or batched (B, V, K) int32."""
    p = np.asarray(packed)
    if p.ndim == 2:
        p = p[None]
    if not per_col:
        from det3d_tpu import csrc
        lib = csrc.get_hostplan_lib()
        if lib is not None:
            # per sample: the kernel's blocks are aligned within each sample
            band = 0
            for s in range(p.shape[0]):
                pc = np.ascontiguousarray(p[s], np.int32)
                band = max(band, int(lib.hp_block_band(
                    pc, pc.shape[0], pc.shape[1], block_rows)))
            return band + 12
    B, V, K = p.shape
    nb = -(-V // block_rows)
    p = np.pad(p, ((0, 0), (0, nb * block_rows - V), (0, 0)))
    r0 = (p & _PACK_MASK).reshape(B, nb, block_rows, K).astype(np.int64)
    pres = ((p >> _PACK_SHIFT) != 0).reshape(B, nb, block_rows, K)
    if not per_col:
        r0, pres = r0.reshape(B, nb, -1), pres.reshape(B, nb, -1)
        ax = -1
    else:
        ax = 2
    mx = np.where(pres, r0, -1).max(ax)
    mn = np.where(pres, r0, 1 << 40).min(ax)
    spread = np.where(mx >= 0, mx - mn, 0).max()
    # +kz headroom for the super-row window, + the 8-row alignment slack
    # of the block base (band_prep aligns lo down for the in-kernel DMA);
    # per-col additionally absorbs the sub-band start's own 8-alignment
    return int(spread) + (11 if per_col else 12)


def certify_plan_bands(plan, serve_band: int, block_rows: int = 256,
                       col_band=None, down_band=None, down_col_band=None):
    """True iff every subm stage of a (host) packed plan fits the
    ``serve_band`` bucket band_window_conv was compiled with (and, when
    given, the per-column ``col_band`` bucket; likewise the strided
    stages against ``down_band``/``down_col_band`` when those are set)."""
    keys = [k for k in plan
            if k.startswith(("plan_s", "plan_subm")) or
            (k in ("s0",) or k.startswith("subm"))]
    ok = all(plan_band(plan[k], block_rows) <= serve_band for k in keys)
    if ok and col_band is not None:
        ok = all(plan_band(plan[k], block_rows, per_col=True) <= col_band
                 for k in keys)
    if ok and down_band is not None:
        dkeys = [k for k in plan
                 if k.startswith("plan_down") or k.startswith("down")]
        ok = all(plan_band(plan[k], block_rows) <= down_band
                 for k in dkeys)
        if ok and down_col_band is not None:
            ok = all(plan_band(plan[k], block_rows, per_col=True)
                     <= down_col_band for k in dkeys)
    return ok
