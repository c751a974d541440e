"""Dense backbones: pillar scatter (and the dense middle for SECOND bring-up).

Parity targets:
  * PointPillarsScatter — scatter per-pillar features onto a BEV canvas
    (reference: det3d/models/readers/pillar_encoder.py:158-211; registered as
    a BACKBONE there too). The reference loops batch elements and uses dense
    indexing; here a single batched scatter-with-drop does all samples at
    once. Canvas layout is NHWC (TPU-native) — (B, ny, nx, C).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from det3d_tpu.models.registry import BACKBONES


@BACKBONES.register_module
class PointPillarsScatter(nn.Module):
    num_input_features: int = 64
    norm_cfg: Optional[dict] = None
    ds_factor: int = 1
    name_str: str = "PointPillarsScatter"

    @nn.compact
    def __call__(self, voxel_features, coords, input_shape, train: bool = False):
        """voxel_features: (B, V, C); coords: (B, V, 3) int32 zyx with -1 rows
        for padding; input_shape: static (nx, ny, nz) grid.

        Returns (B, ny, nx, C) canvas.

        Lowering note (measured, v5e): one batched scatter degrades
        superlinearly (0.55 ms/scan at B=1 -> 2.3 at B=8, in every
        set/add/flat/vmap formulation), while per-sample scatters stay fast;
        lax.map over the batch with a sorted unique-index scatter holds
        ~0.5 ms/scan at B=8 (5x). Pillar slots are unique by construction
        (one slot per occupied cell), so unique_indices is sound; the
        argsort makes indices_are_sorted sound."""
        nx, ny = int(input_shape[0]), int(input_shape[1])
        c = voxel_features.shape[-1]

        y = coords[..., 1]
        x = coords[..., 2]
        valid = (y >= 0) & (x >= 0)
        flat_idx = jnp.where(valid, y * nx + x, ny * nx)     # OOB -> dropped

        def scatter_one(args):
            feats, idx = args
            order = jnp.argsort(idx)
            canvas = jnp.zeros((ny * nx, c), feats.dtype)
            return canvas.at[idx[order]].set(
                feats[order], mode="drop", unique_indices=True,
                indices_are_sorted=True)

        canvas = jax.lax.map(scatter_one, (voxel_features, flat_idx))
        return canvas.reshape(-1, ny, nx, c)


# ---------------------------------------------------------------------------
# Sparse middle extractors (SECOND / CBGS)
# ---------------------------------------------------------------------------

from det3d_tpu.models.norm import build_norm  # noqa: E402
from det3d_tpu.ops import sparse as sp  # noqa: E402


class SparseConvBN(nn.Module):
    """One sparse conv layer: gather-GEMM conv + masked (Sync)BN + ReLU.

    The rulebook (idx/mask) is built by the owning backbone once per
    resolution and shared across layers — the TPU analogue of spconv's
    ``indice_key`` (reference scn.py:107-156).

    ``precision="bf16"`` runs the gathers/GEMMs on bf16 activations and
    weights (halving the gathered row bytes) with fp32 accumulation; BN
    statistics and parameters stay fp32.
    """
    out_channels: int
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    use_bias: bool = False
    relu: bool = True
    use_norm: bool = True       # False = the Nobn variants (scn.py:200)
    precision: str = "fp32"
    # band (static int): run subm side columns on the banded one-hot
    # matmul kernel (ops/band_conv.py) instead of slice gathers — serving
    # only (the owning middle passes it for plan-fed eval forward; the
    # band is certified by apis.train.host_plan_fn). col_band: the
    # per-BEV-column sub-band bucket (see band_window_conv).
    band: Optional[int] = None
    col_band: Optional[int] = None

    @nn.compact
    def __call__(self, x, idx, mask, valid, train: bool = False,
                 z_taps=None, inverse=None, band_prep=None):
        from det3d_tpu.models.precision import act_dtype

        # window rulebooks (mask 4-D: idx=r0, mask=per-column tap presence)
        # and flat per-tap rulebooks share the (kvol, cin, cout) weight
        # layout; sp.apply_conv dispatches on the format. ``inverse``
        # (strided convs, train only) switches d(features) to the
        # gather-based inverse-rulebook backward.
        kvol = (mask.shape[-1] * mask.shape[-2] if mask.ndim == 4
                else idx.shape[-1])
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (kvol, cin, self.out_channels), jnp.float32)
        dt = act_dtype(self.precision)
        y = sp.apply_conv(x.astype(dt), idx, mask, w.astype(dt),
                          z_shift_taps=z_taps, inverse=inverse,
                          band=None if train else self.band,
                          col_band=None if train else self.col_band,
                          band_prep=None if train else band_prep)
        if self.use_bias or not self.use_norm:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.out_channels,), jnp.float32)
        if self.use_norm:
            y = build_norm(self.norm_cfg, self.axis_name)(
                y, mask=valid, use_running_average=not train)
        if self.relu:
            y = nn.relu(y)
        return y


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs on a shared rulebook.

    Parity: reference scn.py:46-89 (conv bias=True when norm_cfg set, BN,
    ReLU, second conv+BN, additive skip, ReLU)."""
    channels: int
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    precision: str = "fp32"
    band: Optional[int] = None          # see SparseConvBN.band
    col_band: Optional[int] = None

    @nn.compact
    def __call__(self, x, idx, mask, valid, train: bool = False,
                 band_prep=None):
        zt = sp.center_column_taps(3)
        y = SparseConvBN(self.channels, self.norm_cfg, self.axis_name,
                         use_bias=True, precision=self.precision,
                         band=self.band, col_band=self.col_band)(
                             x, idx, mask, valid, train, z_taps=zt,
                             band_prep=band_prep)
        y = SparseConvBN(self.channels, self.norm_cfg, self.axis_name,
                         use_bias=True, relu=False,
                         precision=self.precision,
                         band=self.band, col_band=self.col_band)(
                             y, idx, mask, valid, train, z_taps=zt,
                             band_prep=band_prep)
        return nn.relu(x + y)


# A/B switch for the fused sort-free downsample transition
# (sp.stage_transition_batch vs conv_out_coords + stage_lookup_batch).
# Measured OFF (round 4, v5e): the sorted path wins — SECOND predict
# 69.8 (off) vs 81.5 (on) ms/scan @ B=2; the transition's dense-grid
# cumsum/scatter passes cost more than the sorts they replace at KITTI
# scale. The fused path remains exact-equivalence-tested and is the
# host plan twin's oracle (sparse_host.transition), so it stays.
_SORT_FREE_TRANSITION = False


def _res0_lookup(voxel_features, coords, shape0, pre_ranked):
    """Rank-order the res0 rows and build their lookup.

    ``pre_ranked`` asserts the voxelizer already emitted rows in yxz rank
    order (VoxelGenerator order="yxz", wired by apis.train.build_stack),
    so the argsort + row reorder is skipped and only the bitmap is built.
    Returns (features, coords, lookup)."""
    if pre_ranked and shape0[0] <= 64:
        return (voxel_features, coords,
                ("bitmap", sp.build_bitmap_batch(coords, shape0)))
    order0, co, lookup0 = sp.stage_lookup_batch(coords, shape0)
    x = jnp.take_along_axis(voxel_features, order0[..., None], axis=1)
    return x, co, lookup0


def _stage_rulebooks(coords, shape, down_kernel, down_stride, down_pad,
                     max_out=None, in_lookup=None, build_subm=True,
                     build_inverse=False):
    """Downsample coords + the two rulebooks for the next stage.

    A sparse stride-2 conv can EXPAND the active set (isolated voxels cover
    up to 8 strided outputs), so ``max_out`` is configurable; the default
    (= input slot count) is right for dense lidar sweeps where downsampling
    shrinks the active count. Overflow drops a spatially-uniform
    hash-ordered subset (see sp.conv_out_coords).

    ``in_lookup`` (required) is the input resolution's shared lookup
    structure (built once per resolution and reused by that resolution's
    subm rulebook — the TPU analogue of spconv ``indice_key`` sharing,
    extended across layer KINDS). The new resolution's lookup is built
    here and returned so the caller can thread it to the next stage.

    New coords come out of conv_out_coords zyx-sorted (the low-z-first
    overflow drop policy), then are re-sorted into the new resolution's
    rank order (sp.stage_lookup_batch) — the bitmap lookup's row contract.

    ``build_inverse`` (train steps) also returns the down conv's inverse
    rulebook (sp.strided_inverse_rulebook_batch) so its backward runs on
    output-rank window gathers instead of per-tap scatter-adds.

    Returns (new_coords, down_idx, down_mask, subm_idx, subm_mask,
    new_shape, new_lookup, down_inverse)."""
    max_out = max_out or coords.shape[1]

    oshape = sp.out_spatial_shape(shape, down_kernel, down_stride, down_pad)
    need_lookup = build_subm or build_inverse
    dinv = None
    if _SORT_FREE_TRANSITION and oshape[0] <= 32:
        # fused sort-free transition: positions + bitmap (+ inverse
        # rulebook, from the same candidate words) in one pass; even
        # when no lookup is needed (dense-tail transition at predict)
        # it replaces the 8V-candidate dedup sort, and every consumer
        # of the rows is order-agnostic
        res = sp.stage_transition_batch(
            coords, shape, down_kernel, down_stride, down_pad, max_out,
            build_inverse=build_inverse)
        out_co, oshape, out_lookup = res[:3]
        dinv = res[3] if len(res) > 3 else None
        if not need_lookup:
            out_lookup = None
    else:
        out_co, _ = jax.vmap(
            lambda co: sp.conv_out_coords(co, shape, down_kernel,
                                          down_stride, down_pad,
                                          max_out))(coords)
        if need_lookup:
            _, out_co, out_lookup = sp.stage_lookup_batch(out_co, oshape)
        else:
            out_lookup = None
    if build_subm:
        sidx, smask = sp.subm_window_rulebook_batch(out_co, oshape, 3,
                                                    out_lookup)
    else:
        sidx = smask = None
    # after the reorder, so the down-rulebook rows match the new ordering
    didx, dmask = sp.conv_window_rulebook_batch(shape, out_co, down_kernel,
                                                down_stride, down_pad,
                                                in_lookup)
    if build_inverse and dinv is None:
        dinv = sp.strided_inverse_rulebook_batch(
            coords, down_kernel, down_stride, down_pad, out_lookup, oshape)
    return out_co, didx, dmask, sidx, smask, oshape, out_lookup, dinv


# ---------------------------------------------------------------------------
# Host-precomputed rulebook plans
# ---------------------------------------------------------------------------
# Every rulebook in a sparse middle is a pure function of the integer voxel
# coordinates, which the input pipeline already owns — so a training step
# can take the whole chain (measured at 71% of the SECOND forward,
# tools/probes/probe_fwd_attrib) off the device entirely: CPU loader workers
# build packed rulebooks (ops/sparse_host.py) under the prefetch window and
# the middles just unpack them (a few VPU shift/mask ops). The device path
# below stays the default (predict, and any train setup without the
# pipeline stage); ``build_plan_device`` is its packed mirror, used as the
# bit-exactness oracle in tests/test_host_plan.py.

# stage geometry shared by every SpMiddle* variant (kernel, stride, padding)
_STAGE_GEOM = ((3, 2, (1, 1, 1)), (3, 2, (1, 1, 1)), (3, 2, (0, 1, 1)),
               ((3, 1, 1), (2, 1, 1), (0, 0, 0)))


def middle_plan_spec(middle, input_shape, max_voxels):
    """Static description of the rulebooks a sparse middle consumes.

    ``middle``: the flax middle module OR a config-like object with the
    same attributes (stage_caps, dense_tail, dense_from, pre_ranked).
    Returns a plain pickleable dict (fork-safe for loader workers):
    shape0, v, pre_ranked, stages = (kernel, stride, padding, cap, subm).
    """
    def get(name, default):
        if isinstance(middle, dict):
            return middle.get(name, default)
        return getattr(middle, name, default)

    nx, ny, nz = (int(s) for s in input_shape)
    shape0 = (nz + 1, ny, nx)
    assert shape0[0] <= 64, "host plans need the bitmap regime (depth <= 64)"
    v = int(max_voxels)
    caps = [max(64, int(v * f)) for f in get("stage_caps", (1.0,) * 4)]
    dense_tail = bool(get("dense_tail", False))
    start = max(1, int(get("dense_from", 3))) if dense_tail else 4
    stages = []
    for i, (k, s, p) in enumerate(_STAGE_GEOM, start=1):
        if i > start:
            break
        stages.append({"kernel": sp._as3(k), "stride": sp._as3(s),
                       "padding": sp._as3(p), "cap": caps[i - 1],
                       "subm": i < start})
    return {"shape0": shape0, "v": v,
            "pre_ranked": bool(get("pre_ranked", False)),
            "stages": tuple(stages)}


def build_plan_device(coords, spec, train):
    """Packed rulebook plan built on device — the jittable mirror of
    ops/sparse_host.py::build_plan (minus point_lin). Used as the host
    twin's exactness oracle; also handy for serving pipelines that want
    the packed format without a host stage."""
    shape0 = tuple(spec["shape0"])
    plan = {}
    if spec["pre_ranked"]:
        co = coords
        lookup = ("bitmap", sp.build_bitmap_batch(co, shape0))
    else:
        order0, co, lookup = sp.stage_lookup_batch(coords, shape0)
        plan["order0"] = order0
    plan["s0"] = sp.pack_windows(
        *sp.subm_window_rulebook_batch(co, shape0, 3, lookup))
    shape = shape0
    for i, st in enumerate(spec["stages"], start=1):
        co, didx, dmask, sidx, smask, shape, lookup, dinv = _stage_rulebooks(
            co, shape, st["kernel"], st["stride"], st["padding"], st["cap"],
            lookup, build_subm=st["subm"], build_inverse=train)
        plan[f"co{i}"] = jax.vmap(lambda c: sp.linearize(c, shape))(co)
        plan[f"down{i}"] = sp.pack_windows(didx, dmask)
        if st["subm"]:
            plan[f"subm{i}"] = sp.pack_windows(sidx, smask)
        if train and dinv is not None:
            plan[f"inv{i}"] = sp.pack_inverse(dinv)
    return plan


def _plan_stage(plan, i, in_shape, kernel, stride, padding, build_subm,
                train):
    """Unpack stage ``i`` of a packed plan — drop-in for _stage_rulebooks
    (returned lookup is None: with a plan nothing downstream builds)."""
    k, s, p = (sp._as3(v) for v in (kernel, stride, padding))
    oshape = sp.out_spatial_shape(in_shape, k, s, p)
    co = jax.vmap(lambda l: sp.delinearize(l, oshape))(plan[f"co{i}"])
    didx, dmask = sp.unpack_windows(plan[f"down{i}"], k[0])
    sidx = smask = None
    if build_subm:
        sidx, smask = sp.unpack_windows(plan[f"subm{i}"], 3)
    dinv = None
    if train and f"inv{i}" in plan:
        ncand = tuple(-(-k[d] // s[d]) for d in range(3))
        dinv = sp.unpack_inverse(plan[f"inv{i}"], (k, s, ncand))
    return co, didx, dmask, sidx, smask, oshape, None, dinv


def _res0_with_plan(voxel_features, coords, shape0, pre_ranked, plan):
    """Plan-aware twin of _res0_lookup: the reorder (when needed) comes
    from the plan's order0; the subm rulebook is unpacked, no lookup is
    built. Returns (features, coords, sidx0, smask0)."""
    if not pre_ranked:
        order0 = plan["order0"]
        coords = jnp.take_along_axis(coords, order0[..., None], axis=1)
        voxel_features = jnp.take_along_axis(voxel_features,
                                             order0[..., None], axis=1)
    sidx0, smask0 = sp.unpack_windows(plan["s0"], 3)
    return voxel_features, coords, sidx0, smask0


def _bev_reshape(features, coords, shape):
    """Scatter final sparse stage to dense and fold depth into channels.

    Parity: SparseConvTensor.dense() + view(N, C*D, H, W) (scn.py:193-197);
    our layout is (B, H, W, C*D) with C-major to mirror the reference's
    channel ordering."""
    dense = sp.to_dense(features, coords, shape)         # (B, D, H, W, C)
    return _fold_depth(dense)


def _fold_depth(dense):
    b, d, h, w, c = dense.shape
    return dense.transpose(0, 2, 3, 4, 1).reshape(b, h, w, c * d)


# ---------------------------------------------------------------------------
# Dense tail: deep resolutions on XLA conv3d
# ---------------------------------------------------------------------------
# Measured (v5e, B=2, V=20k): each gather-GEMM layer costs ~2 ms/scan
# REGARDLESS of channel width — it is bound by the 27xV row-gather
# descriptors, not the GEMM. At deep resolutions the grid is small (res3 of
# KITTI SECOND: 5x200x176 = 176k cells at ~8% occupancy), so a dense conv3d
# on the MXU computes every site faster than the sparse path gathers the
# active ones, with no rulebook at all. A submanifold conv is EXACTLY a
# dense conv masked to active sites (inactive inputs are zero and
# contribute nothing), so masking after every layer keeps parity:
# BN statistics run over the active mask and activations are re-zeroed so
# downstream taps see the sparse pattern.


def _occupancy(coords, shape):
    """(B, V, 3) zyx -> (B, D, H, W) bool active-site mask."""
    d, h, w = shape
    lin = jax.vmap(lambda co: sp.linearize(co, shape))(coords)
    lin = jnp.where(lin == sp._SENTINEL, d * h * w, lin)

    def one(l):
        return jnp.zeros((d * h * w,), bool).at[l].set(True, mode="drop")

    return jax.vmap(one)(lin).reshape(-1, d, h, w)


def _cover_mask(occ, kernel, stride, padding):
    """Occupancy of a strided sparse conv's output set: any output whose
    footprint covers an active input (= max-pool of occupancy)."""
    k, s, p = (sp._as3(v) for v in (kernel, stride, padding))
    return jax.lax.reduce_window(
        occ, False, jax.lax.bitwise_or,
        (1,) + k, (1,) + s, ((0, 0),) + tuple((pp, pp) for pp in p))


class DenseConvBN(nn.Module):
    """Dense-tail twin of SparseConvBN: conv3d + masked BN + ReLU + re-zero.

    The kernel param keeps SparseConvBN's (kvol, cin, cout) shape (z-major
    tap order) so the two formulations share checkpoint layout."""
    out_channels: int
    kernel: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    use_bias: bool = False
    relu: bool = True
    use_norm: bool = True
    precision: str = "fp32"

    @nn.compact
    def __call__(self, x, occ_out, train: bool = False):
        from det3d_tpu.models.precision import act_dtype

        kz, ky, kx = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (kz * ky * kx, cin, self.out_channels), jnp.float32)
        dt = act_dtype(self.precision)
        # (a per-z-slab conv2d decomposition was tried and measured 2x
        # SLOWER than the straight conv3d at res3 scale — XLA tiles the
        # shallow-D conv3d fine: 2.17 ms for 64ch at (2,5,200,176); the
        # round-5 re-test at the CBGS stage-2 scale (2,11,256,256,64)
        # agreed: conv3d 8.3 ms vs zslab 10.2 / zfold 10.9 / NHWDC 11.0 —
        # probe_dense3d)
        # bf16 mode: conv in bf16 (MXU accumulates fp32 internally), then
        # upcast — preferred_element_type=fp32 here breaks the conv's
        # transpose rule under grad (fp32 cotangent vs bf16 operand).
        # Serving (eval BN = running-stats scale/shift): the whole
        # BN/ReLU/mask epilogue stays in the activation dtype — fp32
        # round-trips between dense-tail layers tripled the HBM bytes of
        # every (B, 11, 256, 256, C) tensor for no numerics the bf16
        # matmuls hadn't already given up.
        keep = dt if (not train and dt != jnp.float32) else jnp.float32
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            w.reshape(kz, ky, kx, cin, self.out_channels).astype(dt),
            window_strides=self.stride,
            padding=tuple((p, p) for p in self.padding),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")).astype(keep)
        if self.use_bias or not self.use_norm:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.out_channels,), jnp.float32).astype(
                                   keep)
        if self.use_norm:
            y = build_norm(self.norm_cfg, self.axis_name, dtype=keep)(
                y, mask=occ_out, use_running_average=not train)
        if self.relu:
            y = nn.relu(y)
        return y * occ_out[..., None].astype(y.dtype)


class DenseBasicBlock(nn.Module):
    """Dense-tail twin of SparseBasicBlock (biased convs, masked)."""
    channels: int
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    precision: str = "fp32"

    @nn.compact
    def __call__(self, x, occ, train: bool = False):
        y = DenseConvBN(self.channels, norm_cfg=self.norm_cfg,
                        axis_name=self.axis_name, use_bias=True,
                        precision=self.precision)(x, occ, train)
        y = DenseConvBN(self.channels, norm_cfg=self.norm_cfg,
                        axis_name=self.axis_name, use_bias=True,
                        relu=False, precision=self.precision)(y, occ, train)
        return nn.relu(x + y) * occ[..., None].astype(x.dtype)


@BACKBONES.register_module
class SpMiddleFHD(nn.Module):
    """SECOND sparse middle. Parity: reference scn.py:92-197.

    Input: voxel_features (B, V, C), coords (B, V, 3) int32 zyx (-1 pad),
    input_shape (nx, ny, nz). sparse z-dim gets +1 like the reference
    (scn.py:186 ``sparse_shape = input_shape[::-1] + [1, 0, 0]``).
    Output: (B, ny/8, nx/8, 64 * D_final) BEV feature map.
    """
    num_input_features: int = 128
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    ds_factor: int = 8            # informational (config_tool downsample)
    # Per-stage active-voxel caps as fractions of the input slot count.
    # Measured occupancy on structured KITTI-density scans (V=20000 at
    # 0.05 m): stage1 saturates, stage2 0.97, stage3 0.69, stage4 0.65 —
    # deep-stage caps < 1 cut dead rulebook queries + conv rows (overflow
    # drops are hash-uniform). Default keeps every slot (reference parity);
    # serving configs may set e.g. (1.0, 1.0, 0.75, 0.7).
    stage_caps: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    use_norm: bool = True         # False = SpMiddleFHDNobn (scn.py:200)
    # Stages >= dense_from run on dense conv3d with active-site masking —
    # exactly equivalent while stage caps do not overflow (see the
    # dense-tail note). The crossover is an occupancy/FLOP tradeoff: at
    # KITTI scale res3-on dense measured ~12 ms/scan faster; at CBGS 60k-
    # voxel scale the res2 grid is ~8% occupied and dense_from=2 pays.
    # dense_tail=False disables the dense path entirely (rulebooks
    # everywhere).
    dense_tail: bool = True
    dense_from: int = 3
    precision: str = "fp32"   # "bf16": half-width gathers/GEMMs, fp32 BN
    pre_ranked: bool = False  # rows already yxz-ranked (see _res0_lookup)
    # serve_band: static band bucket for the banded one-hot matmul subm
    # conv (ops/band_conv.py) on the PLAN-FED eval/serving forward; the
    # host plan certifies every subm stage fits (host_plan_fn raises
    # otherwise). None = slice-gather path everywhere. serve_col_band:
    # the per-BEV-column sub-band bucket (band_window_conv col_band).
    serve_band: Optional[int] = None
    serve_col_band: Optional[int] = None
    # serve_down_band / serve_down_col_band: band buckets for the strided
    # (downsample) convs — their per-column spreads are larger (an output
    # block's targets span ~stride x as many input ranks)
    serve_down_band: Optional[int] = None
    serve_down_col_band: Optional[int] = None
    # serve_precision: activation/weight dtype override for the PLAN-FED
    # eval/serving forward only (train numerics untouched); "bf16" halves
    # gathered bytes and runs the band/dense-tail matmuls at full MXU
    # rate. BN/decode stay fp32 as everywhere.
    serve_precision: Optional[str] = None
    name_str: str = "SpMiddleFHD"

    @nn.compact
    def __call__(self, voxel_features, coords, input_shape,
                 train: bool = False, plan=None):
        nx, ny, nz = (int(s) for s in input_shape)
        shape0 = (nz + 1, ny, nx)
        cfg, ax = self.norm_cfg, self.axis_name
        v = coords.shape[1]
        caps = [max(64, int(v * f)) for f in self.stage_caps]
        start = max(1, self.dense_from) if self.dense_tail else 4
        zt = sp.center_column_taps(3)
        serving = plan is not None and not train
        bnd = self.serve_band if serving else None
        cbnd = self.serve_col_band if serving else None
        dbnd = self.serve_down_band if serving else None
        dcbnd = self.serve_down_col_band if serving else None
        prec = (self.serve_precision if serving and self.serve_precision
                else self.precision)

        def SCB(ch, down=False):
            return SparseConvBN(ch, cfg, ax, use_norm=self.use_norm,
                                precision=prec,
                                band=dbnd if down else bnd,
                                col_band=dcbnd if down else cbnd)

        def DCB(ch, **kw):
            return DenseConvBN(ch, norm_cfg=cfg, axis_name=ax,
                               use_norm=self.use_norm,
                               precision=prec, **kw)

        def stage(i, co, shape, k, s, p, lk, build_subm):
            if plan is not None:
                return _plan_stage(plan, i, shape, k, s, p, build_subm,
                                   train)
            return _stage_rulebooks(co, shape, k, s, p, caps[i - 1], lk,
                                    build_subm=build_subm,
                                    build_inverse=train)

        def bprep(idx, mask, down=False):
            # hoist band_window_conv's plan-pure prep once per RULEBOOK —
            # every conv sharing it reuses the triple (band_conv.band_prep)
            b = dbnd if down else bnd
            if b is None:
                return None
            from det3d_tpu.ops.band_conv import band_prep
            cb = dcbnd if down else cbnd
            return band_prep(idx, mask, int(b),
                             col_band=None if cb is None else int(cb),
                             center_shift=not down)

        if plan is not None:
            x, coords, sidx0, smask0 = _res0_with_plan(
                voxel_features, coords, shape0, self.pre_ranked, plan)
            lookup0 = None
        else:
            x, coords, lookup0 = _res0_lookup(voxel_features, coords,
                                              shape0, self.pre_ranked)
            sidx0, smask0 = sp.subm_window_rulebook_batch(coords, shape0, 3,
                                                          lookup0)
        valid0 = coords[:, :, 0] >= 0
        prep0 = bprep(sidx0, smask0)
        x = SCB(16)(x, sidx0, smask0, valid0, train, z_taps=zt,
                    band_prep=prep0)
        x = SCB(16)(x, sidx0, smask0, valid0, train, z_taps=zt,
                    band_prep=prep0)

        # (channels, n_subm, kernel, stride, padding) per downsample stage
        specs = [(32, 2, 3, 2, 1), (64, 3, 3, 2, 1), (64, 3, 3, 2, (0, 1, 1))]
        co, shape, lk = coords, shape0, lookup0
        xd = occ = None
        for i, (ch, n_subm, k, s, p) in enumerate(specs, start=1):
            if i < start:
                (co, didx, dmask, sidx, smask, shape, lk,
                 dinv) = stage(i, co, shape, k, s, p, lk, True)
                valid = co[:, :, 0] >= 0
                x = SCB(ch, down=True)(x, didx, dmask, valid, train,
                                       inverse=dinv,
                                       band_prep=bprep(didx, dmask,
                                                       down=True))
                prep_i = bprep(sidx, smask)
                for _ in range(n_subm):
                    x = SCB(ch)(x, sidx, smask, valid, train, z_taps=zt,
                                band_prep=prep_i)
            elif i == start:
                # transition: sparse strided conv, then densify this stage
                co, didx, dmask, _, _, shape, _, dinv = stage(
                    i, co, shape, k, s, p, lk, False)
                valid = co[:, :, 0] >= 0
                x = SCB(ch, down=True)(x, didx, dmask, valid, train,
                                       inverse=dinv,
                                       band_prep=bprep(didx, dmask,
                                                       down=True))
                occ = _occupancy(co, shape)
                # serving bf16: densify in the activation dtype (halves
                # the (B, D, H, W, C) canvas scatter+memset bytes)
                from det3d_tpu.models.precision import act_dtype
                tdt = act_dtype(prec) if not train else jnp.float32
                xd = sp.to_dense(x.astype(tdt), co, shape)
                for _ in range(n_subm):
                    xd = DCB(ch)(xd, occ, train)
            else:
                k3, s3, p3 = sp._as3(k), sp._as3(s), sp._as3(p)
                occ = _cover_mask(occ, k3, s3, p3)
                xd = DCB(ch, kernel=k3, stride=s3, padding=p3)(xd, occ,
                                                               train)
                for _ in range(n_subm):
                    xd = DCB(ch)(xd, occ, train)

        if xd is not None:
            occ4 = _cover_mask(occ, (3, 1, 1), (2, 1, 1), (0, 0, 0))
            xd = DCB(64, kernel=(3, 1, 1), stride=(2, 1, 1),
                     padding=(0, 0, 0))(xd, occ4, train)
            return _fold_depth(xd)

        co4, didx, dmask, _, _, shape4, _, dinv = stage(
            4, co, shape, (3, 1, 1), (2, 1, 1), 0, lk, False)
        valid4 = co4[:, :, 0] >= 0
        x = SCB(64, down=True)(x, didx, dmask, valid4, train, inverse=dinv,
                               band_prep=bprep(didx, dmask, down=True))

        return _bev_reshape(x, co4, shape4)


@BACKBONES.register_module
class SpMiddleResNetFHD(nn.Module):
    """CBGS residual sparse middle. Parity: reference scn.py:308-370.

    ``dense_from``/``dense_tail``/``stage_caps``: see SpMiddleFHD. At the
    CBGS operating point (60k voxels on a 1024x1024x40 grid) the res2 grid
    is ~8% occupied, so nusc serving configs set dense_from=2."""
    num_input_features: int = 128
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    ds_factor: int = 8            # informational (config_tool downsample)
    stage_caps: Sequence[float] = (1.0, 1.0, 1.0, 1.0)   # see SpMiddleFHD
    dense_tail: bool = True                              # see SpMiddleFHD
    dense_from: int = 3
    precision: str = "fp32"                              # see SpMiddleFHD
    pre_ranked: bool = False                             # see _res0_lookup
    serve_band: Optional[int] = None                     # see SpMiddleFHD
    serve_col_band: Optional[int] = None                 # see SpMiddleFHD
    serve_down_band: Optional[int] = None                # see SpMiddleFHD
    serve_down_col_band: Optional[int] = None            # see SpMiddleFHD
    serve_precision: Optional[str] = None                # see SpMiddleFHD
    name_str: str = "SpMiddleResNetFHD"

    @nn.compact
    def __call__(self, voxel_features, coords, input_shape,
                 train: bool = False, plan=None):
        nx, ny, nz = (int(s) for s in input_shape)
        shape0 = (nz + 1, ny, nx)
        cfg, ax = self.norm_cfg, self.axis_name
        v = coords.shape[1]
        caps = [max(64, int(v * f)) for f in self.stage_caps]
        start = max(1, self.dense_from) if self.dense_tail else 4
        serving = plan is not None and not train
        bnd = self.serve_band if serving else None
        cbnd = self.serve_col_band if serving else None
        dbnd = self.serve_down_band if serving else None
        dcbnd = self.serve_down_col_band if serving else None
        pr = (self.serve_precision if serving and self.serve_precision
              else self.precision)

        def stage(i, co, shape, k, s, p, lk, build_subm):
            if plan is not None:
                return _plan_stage(plan, i, shape, k, s, p, build_subm,
                                   train)
            return _stage_rulebooks(co, shape, k, s, p, caps[i - 1], lk,
                                    build_subm=build_subm,
                                    build_inverse=train)

        def bprep(idx, mask, down=False):
            # see SpMiddleFHD.bprep: one prep per rulebook, shared by the
            # stage's convs (5 s0 convs / 4 subm-stage convs each)
            b = dbnd if down else bnd
            if b is None:
                return None
            from det3d_tpu.ops.band_conv import band_prep
            cb = dcbnd if down else cbnd
            return band_prep(idx, mask, int(b),
                             col_band=None if cb is None else int(cb),
                             center_shift=not down)

        if plan is not None:
            x, coords, sidx0, smask0 = _res0_with_plan(
                voxel_features, coords, shape0, self.pre_ranked, plan)
            lookup0 = None
        else:
            x, coords, lookup0 = _res0_lookup(voxel_features, coords,
                                              shape0, self.pre_ranked)
            sidx0, smask0 = sp.subm_window_rulebook_batch(coords, shape0, 3,
                                                          lookup0)
        valid0 = coords[:, :, 0] >= 0
        prep0 = bprep(sidx0, smask0)
        x = SparseConvBN(16, cfg, ax, precision=pr, band=bnd,
                         col_band=cbnd)(
            x, sidx0, smask0, valid0, train,
            z_taps=sp.center_column_taps(3), band_prep=prep0)
        x = SparseBasicBlock(16, cfg, ax, precision=pr, band=bnd,
                             col_band=cbnd)(
            x, sidx0, smask0, valid0, train, band_prep=prep0)
        x = SparseBasicBlock(16, cfg, ax, precision=pr, band=bnd,
                             col_band=cbnd)(
            x, sidx0, smask0, valid0, train, band_prep=prep0)

        specs = [(32, 3, 2, 1), (64, 3, 2, 1), (128, 3, 2, (0, 1, 1))]
        co, shape, lk = coords, shape0, lookup0
        xd = occ = None
        for i, (ch, k, s, p) in enumerate(specs, start=1):
            if i < start:
                (co, didx, dmask, sidx, smask, shape, lk,
                 dinv) = stage(i, co, shape, k, s, p, lk, True)
                valid = co[:, :, 0] >= 0
                x = SparseConvBN(ch, cfg, ax, precision=pr, band=dbnd,
                                 col_band=dcbnd)(
                    x, didx, dmask, valid, train, inverse=dinv,
                    band_prep=bprep(didx, dmask, down=True))
                prep_i = bprep(sidx, smask)
                x = SparseBasicBlock(ch, cfg, ax, precision=pr, band=bnd,
                                     col_band=cbnd)(x, sidx, smask, valid,
                                                    train,
                                                    band_prep=prep_i)
                x = SparseBasicBlock(ch, cfg, ax, precision=pr, band=bnd,
                                     col_band=cbnd)(x, sidx, smask, valid,
                                                    train,
                                                    band_prep=prep_i)
            elif i == start:
                co, didx, dmask, _, _, shape, _, dinv = stage(
                    i, co, shape, k, s, p, lk, False)
                valid = co[:, :, 0] >= 0
                x = SparseConvBN(ch, cfg, ax, precision=pr, band=dbnd,
                                 col_band=dcbnd)(
                    x, didx, dmask, valid, train, inverse=dinv,
                    band_prep=bprep(didx, dmask, down=True))
                occ = _occupancy(co, shape)
                from det3d_tpu.models.precision import act_dtype
                tdt = act_dtype(pr) if not train else jnp.float32
                xd = sp.to_dense(x.astype(tdt), co, shape)
                xd = DenseBasicBlock(ch, cfg, ax, precision=pr)(xd, occ,
                                                                train)
                xd = DenseBasicBlock(ch, cfg, ax, precision=pr)(xd, occ,
                                                                train)
            else:
                k3, s3, p3 = sp._as3(k), sp._as3(s), sp._as3(p)
                occ = _cover_mask(occ, k3, s3, p3)
                xd = DenseConvBN(ch, kernel=k3, stride=s3, padding=p3,
                                 norm_cfg=cfg, axis_name=ax,
                                 precision=pr)(xd, occ, train)
                xd = DenseBasicBlock(ch, cfg, ax, precision=pr)(xd, occ,
                                                                train)
                xd = DenseBasicBlock(ch, cfg, ax, precision=pr)(xd, occ,
                                                                train)

        if xd is not None:
            occ4 = _cover_mask(occ, (3, 1, 1), (2, 1, 1), (0, 0, 0))
            xd = DenseConvBN(128, kernel=(3, 1, 1), stride=(2, 1, 1),
                             padding=(0, 0, 0), norm_cfg=cfg,
                             axis_name=ax, precision=pr)(xd, occ4, train)
            return _fold_depth(xd)

        co4, didx, dmask, _, _, shape4, _, dinv = stage(
            4, co, shape, (3, 1, 1), (2, 1, 1), 0, lk, False)
        valid4 = co4[:, :, 0] >= 0
        x = SparseConvBN(128, cfg, ax, precision=pr, band=dbnd,
                         col_band=dcbnd)(
            x, didx, dmask, valid4, train, inverse=dinv,
            band_prep=bprep(didx, dmask, down=True))

        return _bev_reshape(x, co4, shape4)


@BACKBONES.register_module
class SpMiddleFHDNobn(nn.Module):
    """SpMiddleFHD with every BN removed and conv biases on — the exact
    layer schedule of reference scn.py:200-305 (which is SpMiddleFHD with
    the norm lines commented out)."""
    num_input_features: int = 128
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    ds_factor: int = 8
    stage_caps: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    dense_tail: bool = True                              # see SpMiddleFHD
    dense_from: int = 3
    pre_ranked: bool = False
    serve_band: Optional[int] = None                     # see SpMiddleFHD
    serve_precision: Optional[str] = None                # see SpMiddleFHD
    name_str: str = "SpMiddleFHDNobn"

    @nn.compact
    def __call__(self, voxel_features, coords, input_shape,
                 train: bool = False, plan=None):
        return SpMiddleFHD(num_input_features=self.num_input_features,
                           norm_cfg=self.norm_cfg, axis_name=self.axis_name,
                           ds_factor=self.ds_factor,
                           stage_caps=tuple(self.stage_caps),
                           dense_tail=self.dense_tail,
                           dense_from=self.dense_from,
                           pre_ranked=self.pre_ranked,
                           serve_band=self.serve_band,
                           serve_precision=self.serve_precision,
                           use_norm=False)(voxel_features, coords,
                                           input_shape, train, plan=plan)


@BACKBONES.register_module
class RCNNSpMiddleFHD(nn.Module):
    """Cropped-region sparse middle for the 2-stage RCNN experiments.

    Parity: scn.py:373-457 — the SpMiddleFHD schedule with the per-stage
    subm stacks thinned to one conv each (the reference comments the rest
    out) and a trailing stride-2 z-collapse; channels 16-32-64-64-64.
    Grid axes are z-major (z, y, x) as everywhere in this framework; the
    reference's crop grids use the same spconv layout.
    """
    num_input_features: int = 128
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    ds_factor: int = 8
    stage_caps: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    pre_ranked: bool = False                             # see _res0_lookup
    name_str: str = "RCNNSpMiddleFHD"

    @nn.compact
    def __call__(self, voxel_features, coords, input_shape,
                 train: bool = False, plan=None):
        nx, ny, nz = (int(s) for s in input_shape)
        shape0 = (nz + 1, ny, nx)
        cfg, ax = self.norm_cfg, self.axis_name
        v = coords.shape[1]
        caps = [max(64, int(v * f)) for f in self.stage_caps]

        def stage(i, co, shape, k, s, p, lk, build_subm):
            if plan is not None:
                return _plan_stage(plan, i, shape, k, s, p, build_subm,
                                   train)
            return _stage_rulebooks(co, shape, k, s, p, caps[i - 1], lk,
                                    build_subm=build_subm,
                                    build_inverse=train)

        if plan is not None:
            x, coords, sidx0, smask0 = _res0_with_plan(
                voxel_features, coords, shape0, self.pre_ranked, plan)
            lookup0 = None
        else:
            x, coords, lookup0 = _res0_lookup(voxel_features, coords,
                                              shape0, self.pre_ranked)
            sidx0, smask0 = sp.subm_window_rulebook_batch(coords, shape0, 3,
                                                          lookup0)
        valid0 = coords[:, :, 0] >= 0
        x = SparseConvBN(16, cfg, ax)(x, sidx0, smask0, valid0, train, z_taps=sp.center_column_taps(3))
        x = SparseConvBN(16, cfg, ax)(x, sidx0, smask0, valid0, train, z_taps=sp.center_column_taps(3))

        co1, didx, dmask, sidx, smask, shape1, lk1, dinv1 = stage(
            1, coords, shape0, 3, 2, 1, lookup0, True)
        valid1 = co1[:, :, 0] >= 0
        x = SparseConvBN(32, cfg, ax)(x, didx, dmask, valid1, train, inverse=dinv1)
        x = SparseConvBN(32, cfg, ax)(x, sidx, smask, valid1, train, z_taps=sp.center_column_taps(3))

        co2, didx, dmask, sidx, smask, shape2, lk2, dinv2 = stage(
            2, co1, shape1, 3, 2, 1, lk1, True)
        valid2 = co2[:, :, 0] >= 0
        x = SparseConvBN(64, cfg, ax)(x, didx, dmask, valid2, train, inverse=dinv2)
        x = SparseConvBN(64, cfg, ax)(x, sidx, smask, valid2, train, z_taps=sp.center_column_taps(3))

        co3, didx, dmask, sidx, smask, shape3, lk3, dinv3 = stage(
            3, co2, shape2, 3, 2, (0, 1, 1), lk2, True)
        valid3 = co3[:, :, 0] >= 0
        x = SparseConvBN(64, cfg, ax)(x, didx, dmask, valid3, train, inverse=dinv3)
        x = SparseConvBN(64, cfg, ax)(x, sidx, smask, valid3, train, z_taps=sp.center_column_taps(3))

        co4, didx, dmask, _, _, shape4, _, dinv4 = stage(
            4, co3, shape3, (3, 1, 1), (2, 1, 1), 0, lk3, False)
        valid4 = co4[:, :, 0] >= 0
        x = SparseConvBN(64, cfg, ax)(x, didx, dmask, valid4, train, inverse=dinv4)

        return _bev_reshape(x, co4, shape4)
