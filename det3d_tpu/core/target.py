"""On-device anchor target assignment (fixed shapes, jit-able).

The reference runs detectron-style anchor labeling in DataLoader workers on
numpy (reference: det3d/core/anchor/target_ops.py:28-222 ``create_target_np``,
det3d/core/anchor/target_assigner.py:68-142 ``assign_v2``). On TPU the whole
assignment is a vectorized device computation over padded GT boxes: the
similarity matrix, bidirectional argmax matching (with the reference's
force-match-ties and empty-gt rules), and box encoding all fuse into the
training step, removing the CPU data-plane bottleneck.

Semantics parity notes (create_target_np, positive_fraction=None — the only
mode the shipped configs use):
  * labels: -1 ignore, 0 background, >0 global class id
  * precedence: force-match (anchors tying a gt's best overlap) > positive
    (>= matched_threshold) > background (< unmatched_threshold) > ignore
  * a gt whose best overlap is exactly 0 force-matches nothing
  * no valid gt at all -> every anchor is background
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from det3d_tpu.core import box_ops
from det3d_tpu.core.anchors import GroundBox3dCoder
from det3d_tpu.core.geometry import rotated_iou_matrix


# ---------------------------------------------------------------------------
# region similarity (reference: det3d/core/bbox/region_similarity.py:53-125)
# ---------------------------------------------------------------------------

def nearest_iou_similarity(anchors_rbv, gt_rbv):
    """Axis-aligned IoU of the nearest standup boxes of rotated BEV boxes."""
    a = box_ops.rbbox2d_to_near_bbox(anchors_rbv)
    g = box_ops.rbbox2d_to_near_bbox(gt_rbv)
    return box_ops.iou_matrix(a, g)


def rotate_iou_similarity(anchors_rbv, gt_rbv):
    return rotated_iou_matrix(anchors_rbv, gt_rbv, criterion=-1)


def distance_similarity(anchors_rbv, gt_rbv, distance_norm=2.0, with_rotation=False,
                        rotation_alpha=0.5):
    """Negative normalized center distance (region_similarity.py:96-125)."""
    diff = anchors_rbv[:, None, :2] - gt_rbv[None, :, :2]
    dist = jnp.linalg.norm(diff, axis=-1) / distance_norm
    if with_rotation:
        rot_diff = jnp.abs(jnp.sin(anchors_rbv[:, None, 4] - gt_rbv[None, :, 4]))
        dist = (1 - rotation_alpha) * dist + rotation_alpha * rot_diff
    return -dist


SIMILARITY_FNS = {
    "nearest_iou_similarity": nearest_iou_similarity,
    "rotate_iou_similarity": rotate_iou_similarity,
    "distance_similarity": distance_similarity,
}


# ---------------------------------------------------------------------------
# core assignment for one anchor group (vectorized create_target_np)
# ---------------------------------------------------------------------------

def create_target(anchors, gt_boxes, gt_valid, gt_classes, similarity_fn,
                  box_encode_fn, matched_threshold, unmatched_threshold,
                  code_size, positive_fraction=None, sample_size=512,
                  rng=None, anchors_mask=None):
    """Vectorized, padded-GT port of create_target_np (target_ops.py:28-222).

    anchors: (A, nd) float. gt_boxes: (G, nd) padded. gt_valid: (G,) bool.
    gt_classes: (G,) int32 (global 1-based ids). thresholds: scalar or (A,).
    positive_fraction/sample_size/rng: RPN-style minibatch subsampling
    (target_ops.py:144-168) — at most positive_fraction*sample_size
    positives kept (excess randomly set to ignore) and sample_size-n_fg
    negatives randomly enabled (with replacement, like the reference);
    unsampled background stays ignore (-1).
    Returns labels (A,) int32, bbox_targets (A, code_size), reg_weights (A,).
    """
    sim = similarity_fn(anchors[:, [0, 1, 3, 4, -1]], gt_boxes[:, [0, 1, 3, 4, -1]])
    neg_inf = jnp.asarray(-1.0, sim.dtype)
    sim = jnp.where(gt_valid[None, :], sim, neg_inf)
    if anchors_mask is not None:
        # pruned anchors (reference prune_anchor_fn, target_assigner.py:40-43)
        # take part in nothing: not in gt-best-match, not pos, and their
        # final label is -1 (create_target_np's unmap fill)
        sim = jnp.where(anchors_mask[:, None], sim, neg_inf)

    anchor_to_gt_argmax = jnp.argmax(sim, axis=1)                 # (A,)
    anchor_to_gt_max = jnp.max(sim, axis=1)                       # (A,)
    gt_to_anchor_max = jnp.max(sim, axis=0)                       # (G,)

    # a gt whose best anchor overlap is exactly 0 must not force-match
    force_eligible = gt_valid & (gt_to_anchor_max > 0)
    force_matrix = (sim == gt_to_anchor_max[None, :]) & force_eligible[None, :]
    force_anchor = jnp.any(force_matrix, axis=1)                   # (A,)

    cls_of_argmax = gt_classes[anchor_to_gt_argmax]                # (A,)
    pos = anchor_to_gt_max >= matched_threshold
    bg = anchor_to_gt_max < unmatched_threshold

    any_gt = jnp.any(gt_valid)
    if positive_fraction is None:
        labels = jnp.where(
            force_anchor | pos, cls_of_argmax,
            jnp.where(bg, 0, -1)).astype(jnp.int32)
        labels = jnp.where(any_gt, labels, 0)
    else:
        assert rng is not None, "positive_fraction subsampling needs rng"
        a = anchors.shape[0]
        # labels start at ignore; only fg is set, bg is enabled by sampling
        labels = jnp.where(force_anchor | pos, cls_of_argmax,
                           -1).astype(jnp.int32)
        labels = jnp.where(any_gt, labels, -1)
        k_fg, k_bg = jax.random.split(rng)

        # subsample positives: keep a random num_fg of the fg anchors
        num_fg = int(positive_fraction * sample_size)
        fg0 = labels > 0
        fg_order = jnp.argsort(
            jnp.where(fg0, jax.random.uniform(k_fg, (a,)), 2.0))
        fg_rank = jnp.zeros((a,), jnp.int32).at[fg_order].set(
            jnp.arange(a, dtype=jnp.int32))
        labels = jnp.where(fg0 & (fg_rank >= num_fg), -1, labels)

        # enable sample_size - n_fg negatives, sampled WITH replacement
        # from the bg pool (when no gt, every anchor is bg — the reference's
        # len(gt)==0 branch sets bg_inds = all)
        bg_pool = jnp.where(any_gt, bg, jnp.ones_like(bg))
        n_fg = (labels > 0).sum()
        num_bg = jnp.maximum(sample_size - n_fg, 0)
        n_bg = bg_pool.sum()
        bg_order = jnp.argsort(~bg_pool)                 # bg indices first
        u = jax.random.randint(k_bg, (sample_size,), 0, jnp.maximum(n_bg, 1))
        chosen = bg_order[u]
        enable = (jnp.arange(sample_size) < num_bg) & (n_bg > num_bg)
        labels = labels.at[jnp.where(enable, chosen, a)].set(0, mode="drop")

    if anchors_mask is not None:
        labels = jnp.where(anchors_mask, labels, -1)

    fg = labels > 0
    # guard padded gt dims against log(0) in the encoder
    safe_gt = gt_boxes.at[:, 3:6].set(jnp.maximum(gt_boxes[:, 3:6], 1e-3))
    matched_gt = safe_gt[anchor_to_gt_argmax]                      # (A, nd)
    encoded = box_encode_fn(matched_gt, anchors)                   # (A, code)
    bbox_targets = jnp.where(fg[:, None], encoded, 0.0)
    reg_weights = fg.astype(anchors.dtype)
    return labels, bbox_targets, reg_weights


# ---------------------------------------------------------------------------
# per-task assigner (mirrors TargetAssigner + assign_v2 layout)
# ---------------------------------------------------------------------------

@dataclass
class TargetAssigner:
    """Per-task assigner over a list of per-class anchor generators.

    Anchors are generated once (numpy) and baked as device constants; the
    ``assign`` method is a pure jax function over padded GT and can run under
    jit/vmap inside the training step.
    """
    box_coder: GroundBox3dCoder
    anchor_generators: List
    similarity: str = "nearest_iou_similarity"
    positive_fraction: Optional[float] = None
    sample_size: int = 512
    anchor_area_threshold: float = -1.0

    def __post_init__(self):
        if self.positive_fraction is not None and self.positive_fraction < 0:
            self.positive_fraction = None
        self._feature_map_size = None
        self._anchors_by_class = None
        self._thresholds = None
        self._mask_cells = None

    @property
    def classes(self):
        return [a.class_name for a in self.anchor_generators]

    @property
    def num_anchors_per_location(self) -> int:
        return sum(a.num_anchors_per_localization for a in self.anchor_generators)

    def generate_anchors(self, feature_map_size):
        """feature_map_size: [D, H, W] zyx. Caches per-class anchors with the
        reference's (fz, fy, fx, loc, nd) layout, concatenated on loc
        (target_assigner.py:144-166)."""
        per_class = []
        for gen in self.anchor_generators:
            a = gen.generate(feature_map_size)
            a = a.reshape([*a.shape[:3], -1, a.shape[-1]])
            per_class.append(a.astype(np.float32))
        self._feature_map_size = tuple(int(s) for s in feature_map_size)
        self._anchors_by_class = per_class
        self._thresholds = [
            (float(g.match_threshold), float(g.unmatch_threshold))
            for g in self.anchor_generators
        ]
        full = np.concatenate(per_class, axis=-2)
        return full.reshape(-1, full.shape[-1])

    @property
    def anchors_flat(self) -> np.ndarray:
        full = np.concatenate(self._anchors_by_class, axis=-2)
        return full.reshape(-1, full.shape[-1])

    # -- anchors_mask (anchor_area_threshold >= 0) -------------------------
    # Parity: preprocess.py:433-448 + box_np_ops.py sparse_sum_for_
    # anchors_mask / fused_get_anchors_area. The BEV occupancy integral
    # image is built on device per sample; the 4 summed-area corner cells
    # per anchor are STATIC (anchors are baked), precomputed in numpy here.

    def prepare_anchors_mask(self, voxel_size, pc_range, grid_size):
        """Precompute per-generator integral-image corner cells (A_g, 4)
        int32 [x0, y0, x1, y1], with the reference's floor + clip rules."""
        vx, vy = float(voxel_size[0]), float(voxel_size[1])
        ox, oy = float(pc_range[0]), float(pc_range[1])
        gx, gy = int(grid_size[0]), int(grid_size[1])
        cells = []
        for a in self._anchors_by_class:
            flat = a.reshape(-1, a.shape[-1])
            bv = np.asarray(box_ops.rbbox2d_to_near_bbox(
                flat[:, [0, 1, 3, 4, -1]]))              # (A, 4) xyxy metric
            c = np.stack([
                np.floor((bv[:, 0] - ox) / vx),
                np.floor((bv[:, 1] - oy) / vy),
                np.floor((bv[:, 2] - ox) / vx),
                np.floor((bv[:, 3] - oy) / vy)], -1).astype(np.int64)
            c[:, 0] = np.clip(c[:, 0], 0, None)
            c[:, 1] = np.clip(c[:, 1], 0, None)
            c[:, 2] = np.clip(c[:, 2], None, gx - 1)
            c[:, 3] = np.clip(c[:, 3], None, gy - 1)
            cells.append(c.astype(np.int32))
        self._mask_cells = cells

    def anchors_mask(self, coords, grid_size):
        """(V, 3) zyx device coords -> (A,) bool mask, assign_v2 layout.

        occupancy scatter + inclusive double cumsum + 4 corner lookups,
        exactly like the numba kernels (including the inclusive-integral
        off-by-one: the counted window is (y0, y1] x (x0, x1])."""
        assert self._mask_cells is not None, "call prepare_anchors_mask first"
        gx, gy = int(grid_size[0]), int(grid_size[1])
        valid = coords[:, 0] >= 0
        yi = jnp.where(valid, coords[:, 1], gy)
        xi = jnp.where(valid, coords[:, 2], gx)
        occ = jnp.zeros((gy, gx), jnp.float32).at[yi, xi].add(
            1.0, mode="drop")
        integral = occ.cumsum(0).cumsum(1)

        fz, fy, fx = self._feature_map_size
        masks = []
        for a, cells in zip(self._anchors_by_class, self._mask_cells):
            num_loc = a.shape[-2]
            c = jnp.asarray(cells)                           # (A_g, 4)
            lookup = integral[c[:, 3], c[:, 2]] - integral[c[:, 3], c[:, 0]] \
                - integral[c[:, 1], c[:, 2]] + integral[c[:, 1], c[:, 0]]
            masks.append((lookup > self.anchor_area_threshold).reshape(
                fz, fy, fx, num_loc))
        return jnp.concatenate(masks, axis=-1).reshape(-1)

    def assign(self, gt_boxes, gt_classes, gt_valid, class_ids: Sequence[int],
               rng=None, anchors_mask=None):
        """Assign padded GT to this task's anchors (jit-friendly).

        gt_boxes: (G, nd), gt_classes: (G,) global 1-based ids, gt_valid: (G,)
        bool, class_ids: per-generator global id (static python ints, in the
        same order as anchor_generators). rng: PRNGKey, required only when
        positive_fraction subsampling is enabled.

        Returns labels (A,), bbox_targets (A, code), reg_weights (A,) in the
        assign_v2 concatenated-per-location layout (target_assigner.py:113-140).
        """
        assert self._anchors_by_class is not None, "call generate_anchors first"
        sim_fn = SIMILARITY_FNS[self.similarity]
        fz, fy, fx = self._feature_map_size
        code = self.box_coder.code_size
        if self.positive_fraction is not None and rng is not None:
            gen_keys = list(jax.random.split(rng, len(self._anchors_by_class)))
        else:
            gen_keys = [None] * len(self._anchors_by_class)
        if anchors_mask is not None:
            total_loc = sum(a.shape[-2] for a in self._anchors_by_class)
            mask_by_loc = anchors_mask.reshape(fz, fy, fx, total_loc)

        labels_list, targets_list, weights_list = [], [], []
        loc_offset = 0
        for gen_anchors, (mt, ut), cid, key in zip(
                self._anchors_by_class, self._thresholds, class_ids, gen_keys):
            num_loc = gen_anchors.shape[-2]
            flat_anchors = jnp.asarray(gen_anchors.reshape(-1, gen_anchors.shape[-1]))
            cls_mask = gt_valid & (gt_classes == cid)
            gen_amask = None
            if anchors_mask is not None:
                gen_amask = mask_by_loc[
                    ..., loc_offset:loc_offset + num_loc].reshape(-1)
            loc_offset += num_loc
            labels, targets, weights = create_target(
                flat_anchors, gt_boxes, cls_mask, gt_classes, sim_fn,
                self.box_coder.encode, mt, ut, code,
                positive_fraction=(self.positive_fraction
                                   if key is not None else None),
                sample_size=self.sample_size, rng=key,
                anchors_mask=gen_amask)
            labels_list.append(labels.reshape(fz, fy, fx, num_loc))
            targets_list.append(targets.reshape(fz, fy, fx, num_loc, code))
            weights_list.append(weights.reshape(fz, fy, fx, num_loc))

        labels = jnp.concatenate(labels_list, axis=-1).reshape(-1)
        bbox_targets = jnp.concatenate(targets_list, axis=-2).reshape(-1, code)
        reg_weights = jnp.concatenate(weights_list, axis=-1).reshape(-1)
        return labels, bbox_targets, reg_weights


def build_target_assigners(target_assigner_cfg, box_coder, tasks) -> List[TargetAssigner]:
    """Build one TargetAssigner per task from the reference config schema
    (pipelines/preprocess.py:308-344): the flat anchor_generators list is
    partitioned across tasks by each task's class_names."""
    from det3d_tpu.utils.registry import build_from_cfg
    from det3d_tpu.core.anchors import ANCHOR_GENERATORS

    flat = []
    for g in target_assigner_cfg["anchor_generators"]:
        cfg = dict(g)
        # reference config spells these matched_/unmatched_threshold
        if "matched_threshold" in cfg:
            cfg["match_threshold"] = cfg.pop("matched_threshold")
        if "unmatched_threshold" in cfg:
            cfg["unmatch_threshold"] = cfg.pop("unmatched_threshold")
        flat.append(build_from_cfg(cfg, ANCHOR_GENERATORS))
    sim_type = target_assigner_cfg["region_similarity_calculator"]["type"]
    pos_fraction = target_assigner_cfg.get("sample_positive_fraction", None)
    sample_size = target_assigner_cfg.get("sample_size", 512)
    area_threshold = target_assigner_cfg.get("pos_area_threshold", -1)

    assigners = []
    idx = 0
    for task in tasks:
        n = len(task["class_names"])
        assigners.append(TargetAssigner(
            box_coder=box_coder,
            anchor_generators=flat[idx:idx + n],
            similarity=sim_type,
            positive_fraction=pos_fraction,
            sample_size=sample_size,
            anchor_area_threshold=float(area_threshold
                                        if area_threshold is not None else -1),
        ))
        idx += n
    return assigners
