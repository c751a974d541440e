"""Multi-group (multi-task) anchor head: forward, loss, prediction.

Parity target: reference det3d/models/bbox_heads/mg_head.py —
``Head`` (:198-230, per-task 1x1 convs), ``MultiGroupHead`` (:385-1086):
``prepare_loss_weights`` (:535-578), ``create_loss`` (:147-190, one-hot cls
targets + sin(a-b) angle-difference encoding :29-34), direction classifier
target/loss (:54-65, :636-645), and ``predict``/``get_task_detections``
(:697-1086: per-task decode -> sigmoid scores -> (rotated) NMS -> direction
flip by pi -> post-center-range filter -> merge with label offsets).

TPU re-design notes:
  * everything is fixed-shape: prediction returns per-sample padded
    (max_det, ...) arrays + validity masks, composable under jit/vmap; the
    ragged python loops of the reference become masked vector ops.
  * the loss path is identical math, so training losses match the reference
    numerically for identical inputs.
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from det3d_tpu.core import box_ops
from det3d_tpu.models.losses import build_loss
from det3d_tpu.models.registry import HEADS
from det3d_tpu.ops import nms as nms_ops


def one_hot_f(labels, depth, dtype=jnp.float32):
    return jax.nn.one_hot(labels, depth, dtype=dtype)


def add_sin_difference(boxes1, boxes2):
    """sin(a-b) = sin a cos b - cos a sin b trick on the angle channel.
    Parity: mg_head.py:29-34."""
    rad_pred = jnp.sin(boxes1[..., -1:]) * jnp.cos(boxes2[..., -1:])
    rad_tg = jnp.cos(boxes1[..., -1:]) * jnp.sin(boxes2[..., -1:])
    b1 = jnp.concatenate([boxes1[..., :-1], rad_pred], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :-1], rad_tg], axis=-1)
    return b1, b2


def get_direction_target(anchors, reg_targets, dir_offset=0.0, one_hot=True):
    """Parity: mg_head.py:54-65."""
    rot_gt = reg_targets[..., -1] + anchors[..., -1]
    dir_cls = (box_ops.limit_period(rot_gt - dir_offset, 0.5, 2 * np.pi) > 0)
    dir_cls = dir_cls.astype(jnp.int32)
    if one_hot:
        return one_hot_f(dir_cls, 2, dtype=reg_targets.dtype)
    return dir_cls


def prepare_loss_weights(labels, loss_norm, dtype=jnp.float32):
    """Parity: mg_head.py:535-578. labels: (B, A) int."""
    norm_type = loss_norm.get("type", "NormByNumPositives")
    pos_w = loss_norm.get("pos_cls_weight", 1.0)
    neg_w = loss_norm.get("neg_cls_weight", 1.0)

    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = negatives.astype(dtype) * neg_w + positives.astype(dtype) * pos_w
    reg_weights = positives.astype(dtype)

    if norm_type == "NormByNumExamples":
        num_examples = jnp.clip(cared.astype(dtype).sum(1, keepdims=True), 1.0)
        cls_weights = cls_weights / num_examples
        bbox_norm = positives.sum(1, keepdims=True).astype(dtype)
        reg_weights = reg_weights / jnp.clip(bbox_norm, 1.0)
    elif norm_type == "NormByNumPositives":
        pos_norm = positives.sum(1, keepdims=True).astype(dtype)
        reg_weights = reg_weights / jnp.clip(pos_norm, 1.0)
        cls_weights = cls_weights / jnp.clip(pos_norm, 1.0)
    elif norm_type == "NormByNumPosNeg":
        pos_neg = jnp.stack([positives, negatives], axis=-1).astype(dtype)
        normalizer = pos_neg.sum(1, keepdims=True)               # (B, 1, 2)
        cls_normalizer = jnp.clip((pos_neg * normalizer).sum(-1), 1.0)
        normalizer = jnp.clip(normalizer, 1.0)
        reg_weights = reg_weights / normalizer[:, 0:1, 0]
        cls_weights = cls_weights / cls_normalizer
    elif norm_type == "DontNorm":
        pos_norm = positives.sum(1, keepdims=True).astype(dtype)
        reg_weights = reg_weights / jnp.clip(pos_norm, 1.0)
    else:
        raise ValueError(f"unknown loss norm {norm_type}")
    return cls_weights, reg_weights, cared


def create_loss(loc_loss_ftor, cls_loss_ftor, box_preds, cls_preds, cls_targets,
                cls_weights, reg_targets, reg_weights, num_class,
                encode_background_as_zeros=True, encode_rad_error_by_sin=True,
                box_code_size=7):
    """Parity: mg_head.py:147-190. Shapes: preds (B, H, W, loc*code)."""
    batch = box_preds.shape[0]
    box_preds = box_preds.reshape(batch, -1, box_code_size)
    if encode_background_as_zeros:
        cls_preds = cls_preds.reshape(batch, -1, num_class)
    else:
        cls_preds = cls_preds.reshape(batch, -1, num_class + 1)
    one_hot_targets = one_hot_f(cls_targets, num_class + 1, dtype=box_preds.dtype)
    if encode_background_as_zeros:
        one_hot_targets = one_hot_targets[..., 1:]
    if encode_rad_error_by_sin:
        box_preds, reg_targets = add_sin_difference(box_preds, reg_targets)
    loc_losses = loc_loss_ftor(box_preds, reg_targets, weights=reg_weights)
    cls_losses = cls_loss_ftor(cls_preds, one_hot_targets, weights=cls_weights)
    return loc_losses, cls_losses


class TaskHead(nn.Module):
    """Per-task 1x1 conv head. Parity: mg_head.Head (:198-230). NHWC."""
    num_pred: int
    num_cls: int
    use_dir: bool = False
    num_dir: int = 0

    @nn.compact
    def __call__(self, x):
        # predictions always leave in fp32 (loss/decode numerics), whatever
        # precision the trunk ran in
        f32 = jnp.float32
        box_preds = nn.Conv(self.num_pred, (1, 1), dtype=x.dtype,
                            name="conv_box")(x).astype(f32)
        cls_preds = nn.Conv(self.num_cls, (1, 1), dtype=x.dtype,
                            name="conv_cls")(x).astype(f32)
        ret = {"box_preds": box_preds, "cls_preds": cls_preds}
        if self.use_dir:
            ret["dir_cls_preds"] = nn.Conv(
                self.num_dir, (1, 1), dtype=x.dtype,
                name="conv_dir")(x).astype(f32)
        return ret


@HEADS.register_module
class MultiGroupHead(nn.Module):
    mode: str = "3d"
    in_channels: int = 128
    norm_cfg: Optional[dict] = None
    tasks: Sequence[dict] = ()
    weights: Sequence[float] = ()
    box_coder: Any = None
    with_cls: bool = True
    with_reg: bool = True
    encode_background_as_zeros: bool = True
    loss_norm: dict = field(default_factory=lambda: dict(
        type="NormByNumPositives", pos_cls_weight=1.0, neg_cls_weight=1.0))
    loss_cls: dict = field(default_factory=lambda: dict(
        type="SigmoidFocalLoss", alpha=0.25, gamma=2.0, loss_weight=1.0))
    use_sigmoid_score: bool = True
    loss_bbox: dict = field(default_factory=lambda: dict(
        type="WeightedSmoothL1Loss", sigma=3.0, codewise=True, loss_weight=1.0))
    encode_rad_error_by_sin: bool = True
    loss_aux: Optional[dict] = None
    direction_offset: float = 0.0
    name_str: str = "rpn"
    logger: Optional[object] = None

    @property
    def num_classes(self) -> List[int]:
        return [len(t["class_names"]) for t in self.tasks]

    @property
    def num_anchor_per_locs(self) -> List[int]:
        return [2 * n for n in self.num_classes]

    @property
    def use_direction_classifier(self) -> bool:
        return self.loss_aux is not None

    @property
    def box_n_dim(self) -> int:
        return self.box_coder.code_size

    @property
    def anchor_dim(self) -> int:
        return self.box_coder.n_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        ret = []
        code_size = self.box_coder.code_size
        for task_id, (num_c, num_a) in enumerate(
                zip(self.num_classes, self.num_anchor_per_locs)):
            num_cls = num_a * (num_c if self.encode_background_as_zeros
                               else num_c + 1)
            num_pred = num_a * code_size
            num_dir = num_a * 2 if self.use_direction_classifier else 0
            ret.append(TaskHead(
                num_pred=num_pred, num_cls=num_cls,
                use_dir=self.use_direction_classifier, num_dir=num_dir,
                name=f"task_{task_id}")(x))
        return ret

    # ------------------------------------------------------------------
    # loss (pure; usable without binding)
    # ------------------------------------------------------------------
    def loss(self, example: Dict[str, Any], preds_dicts: List[dict]) -> Dict[str, list]:
        loss_cls_ftor = build_loss(self.loss_cls)
        loss_reg_ftor = build_loss(self.loss_bbox)
        loss_aux_ftor = build_loss(self.loss_aux) if self.loss_aux else None

        batch_size = example["anchors"][0].shape[0]
        rets = []
        for task_id, preds in enumerate(preds_dicts):
            num_class = self.num_classes[task_id]
            labels = example["labels"][task_id]               # (B, A)
            reg_targets = example["reg_targets"][task_id]     # (B, A, code)
            cls_weights, reg_weights, cared = prepare_loss_weights(
                labels, self.loss_norm)
            cls_targets = labels * cared.astype(labels.dtype)

            loc_loss, cls_loss = create_loss(
                loss_reg_ftor, loss_cls_ftor,
                preds["box_preds"], preds["cls_preds"], cls_targets,
                cls_weights, reg_targets, reg_weights, num_class,
                self.encode_background_as_zeros, self.encode_rad_error_by_sin,
                box_code_size=self.box_n_dim)

            loc_loss_reduced = loc_loss.sum() / batch_size * loss_reg_ftor._loss_weight
            cls_loss_sum = cls_loss.sum() / batch_size
            # pos/neg split for logging: parity with _get_pos_neg_loss
            # (mg_head.py:37-50)
            if cls_loss.ndim == 2 or cls_loss.shape[-1] == 1:
                flat = cls_loss.reshape(batch_size, -1)
                cls_pos_loss = ((labels > 0) * flat).sum() / batch_size
                cls_neg_loss = ((labels == 0) * flat).sum() / batch_size
            else:
                cls_pos_loss = cls_loss[..., 1:].sum() / batch_size
                cls_neg_loss = cls_loss[..., 0].sum() / batch_size
            cls_pos_loss = cls_pos_loss / self.loss_norm.get("pos_cls_weight", 1.0)
            cls_neg_loss = cls_neg_loss / self.loss_norm.get("neg_cls_weight", 1.0)
            cls_loss_reduced = cls_loss_sum * loss_cls_ftor._loss_weight
            loss = loc_loss_reduced + cls_loss_reduced

            dir_loss_reduced = jnp.zeros(())
            if self.use_direction_classifier:
                anchors = example["anchors"][task_id].reshape(
                    batch_size, -1, self.anchor_dim)
                dir_targets = get_direction_target(
                    anchors, reg_targets, dir_offset=self.direction_offset)
                dir_logits = preds["dir_cls_preds"].reshape(batch_size, -1, 2)
                weights = (labels > 0).astype(dir_logits.dtype)
                weights = weights / jnp.clip(
                    weights.sum(-1, keepdims=True), 1.0)
                dir_loss = loss_aux_ftor(dir_logits, dir_targets, weights=weights)
                dir_loss_reduced = dir_loss.sum() / batch_size
                loss = loss + dir_loss_reduced * loss_aux_ftor._loss_weight

            loc_loss_elem = loc_loss.sum(axis=(0, 1)) / batch_size
            rets.append({
                "loss": loss,
                "cls_pos_loss": cls_pos_loss,
                "cls_neg_loss": cls_neg_loss,
                "dir_loss_reduced": dir_loss_reduced,
                "cls_loss_reduced": cls_loss_reduced,
                "loc_loss_reduced": loc_loss_reduced,
                "loc_loss_elem": loc_loss_elem,
                "num_pos": (labels[0] > 0).sum(),
                "num_neg": (labels[0] == 0).sum(),
            })
        merged = {}
        for k in rets[0]:
            merged[k] = [r[k] for r in rets]
        return merged

    # ------------------------------------------------------------------
    # prediction (fixed-shape, jit-able)
    # ------------------------------------------------------------------
    def _task_candidates(self, example, preds, task_id, test_cfg):
        """Decode one task's raw head output into NMS candidates.

        Returns (reg, nms_scores, top_labels, dir_labels, offsets), each
        (B, A', ...) where A' = A (or num_class*A under multi-class NMS).
        """
        nms_cfg = test_cfg["nms"] if isinstance(test_cfg, dict) else test_cfg.nms
        use_multi_class = nms_cfg.get("use_multi_class_nms", False)
        score_threshold = float(test_cfg["score_threshold"])

        batch = preds["box_preds"].shape[0]
        anchors = example["anchors"][task_id].reshape(
            batch, -1, self.anchor_dim)
        num_class = self.num_classes[task_id]
        box_preds = preds["box_preds"].reshape(batch, -1, self.box_n_dim)
        cls_preds = preds["cls_preds"].reshape(batch, -1, num_class)
        reg = self.box_coder.decode(box_preds, anchors)   # (B, A, anchor_dim)
        if self.use_direction_classifier:
            dir_preds = preds["dir_cls_preds"].reshape(batch, -1, 2)
            dir_labels = jnp.argmax(dir_preds, axis=-1)
        else:
            dir_labels = jnp.zeros(cls_preds.shape[:2], jnp.int32)

        total_scores = jax.nn.sigmoid(cls_preds)
        amask = example.get("anchors_mask", None)
        if amask is not None and amask[task_id] is not None:
            # reference get_task_detections prunes predictions outside the
            # occupancy mask before NMS (mg_head.py:728-774)
            total_scores = jnp.where(
                amask[task_id].reshape(batch, -1)[..., None],
                total_scores, 0.0)
        if use_multi_class and num_class > 1:
            # per-class NMS (reference box_torch_ops.multiclass_nms via
            # get_task_detections): run the class-agnostic path once per
            # class and concatenate the fixed-size results
            per_cls_scores = jnp.where(
                total_scores >= score_threshold, total_scores, -1.0)
            top_scores = jnp.concatenate(
                [per_cls_scores[..., c] for c in range(num_class)],
                axis=1)
            top_labels = jnp.concatenate(
                [jnp.full(per_cls_scores.shape[:2], c, jnp.int32)
                 for c in range(num_class)], axis=1)
            reg = jnp.tile(reg, (1, num_class, 1))
            dir_labels = jnp.tile(dir_labels, (1, num_class))
            nms_scores = top_scores
            # batched-NMS trick: shift each class to its own far-away
            # region so one NMS pass cannot suppress across classes
            offsets = (top_labels.astype(jnp.float32) * 1e4)[..., None]
        else:
            if num_class == 1:
                top_scores = total_scores[..., 0]
                top_labels = jnp.zeros_like(top_scores, dtype=jnp.int32)
            else:
                top_scores = jnp.max(total_scores, axis=-1)
                top_labels = jnp.argmax(
                    total_scores, axis=-1).astype(jnp.int32)
            keep_thresh = top_scores >= score_threshold
            nms_scores = jnp.where(keep_thresh, top_scores, -1.0)
            offsets = jnp.zeros(reg.shape[:2] + (1,), reg.dtype)
        return reg, nms_scores, top_labels, dir_labels, offsets

    def _nms_select(self, reg, nms_scores, top_labels, dir_labels, offsets,
                    test_cfg, apply_dir: bool):
        """Per-sample fixed-shape NMS over candidate boxes (vmapped)."""
        nms_cfg = test_cfg["nms"] if isinstance(test_cfg, dict) else test_cfg.nms
        use_rotate = nms_cfg["use_rotate_nms"]
        pre_max = int(nms_cfg["nms_pre_max_size"])
        post_max = int(nms_cfg["nms_post_max_size"])
        iou_th = float(nms_cfg["nms_iou_threshold"])
        post_center_range = test_cfg.get("post_center_limit_range", None)

        def per_sample(reg_b, scores_b, labels_b, dir_b, off_b):
            reg_nms = reg_b.at[:, 0].add(off_b[:, 0])
            if use_rotate:
                boxes_for_nms = reg_nms[:, [0, 1, 3, 4, -1]]
            else:
                corners = box_ops.center_to_corner_box2d(
                    reg_nms[:, :2], reg_nms[:, 3:5], reg_nms[:, -1])
                boxes_for_nms = box_ops.corner_to_standup_nd(corners)
            idx, valid = nms_ops.nms(
                boxes_for_nms, scores_b, pre_max_size=pre_max,
                post_max_size=post_max, iou_threshold=iou_th,
                rotated=bool(use_rotate))
            sel_boxes = reg_b[idx]
            sel_scores = scores_b[idx]
            sel_labels = labels_b[idx]
            sel_dir = dir_b[idx]
            if apply_dir and self.use_direction_classifier:
                opp = jnp.logical_xor(
                    (sel_boxes[:, -1] - self.direction_offset) > 0,
                    sel_dir.astype(bool))
                sel_boxes = sel_boxes.at[:, -1].add(
                    jnp.where(opp, np.pi, 0.0))
            if post_center_range is not None and len(post_center_range) > 0:
                pcr = jnp.asarray(post_center_range, sel_boxes.dtype)
                inside = (
                    jnp.all(sel_boxes[:, :3] >= pcr[:3], axis=1)
                    & jnp.all(sel_boxes[:, :3] <= pcr[3:], axis=1))
                valid = valid & inside
            return sel_boxes, sel_scores, sel_labels, valid

        return jax.vmap(per_sample)(reg, nms_scores, top_labels,
                                    dir_labels, offsets)

    def predict(self, example: Dict[str, Any], preds_dicts: List[dict],
                test_cfg) -> Dict[str, jnp.ndarray]:
        """Decode + NMS all tasks; returns padded per-sample detections.

        Output dict:
          box3d_lidar: (B, D, anchor_dim) with D = num_tasks*post_max_size
          scores:      (B, D)
          label_preds: (B, D) int32 (global label ids across tasks)
          valid:       (B, D) bool
        """
        cands = [self._task_candidates(example, preds, task_id, test_cfg)
                 for task_id, preds in enumerate(preds_dicts)]
        n_tasks = len(cands)
        if n_tasks == 1:
            sel = [self._nms_select(*cands[0], test_cfg, apply_dir=True)]
        else:
            # Tasks are independent NMS problems — fuse them into the NMS
            # vmap axis (one fixpoint over B*T samples instead of T
            # sequential fixpoints; iteration count becomes the max chain
            # depth across tasks instead of the sum). Candidate counts can
            # differ per task: pad to the max with score -1 (invalid).
            amax = max(c[0].shape[1] for c in cands)

            def padto(x, fill):
                if x.shape[1] == amax:
                    return x
                cfgs = [(0, 0)] * x.ndim
                cfgs[1] = (0, amax - x.shape[1])
                return jnp.pad(x, cfgs, constant_values=fill)

            fused = []
            for i, fill in enumerate((0.0, -1.0, 0, 0, 0.0)):
                st = jnp.stack([padto(c[i], fill) for c in cands], axis=1)
                fused.append(st.reshape((-1,) + st.shape[2:]))  # (B*T, ...)
            b, s, l, v = self._nms_select(*fused, test_cfg, apply_dir=True)
            bsz = cands[0][0].shape[0]
            sel = [tuple(x.reshape((bsz, n_tasks) + x.shape[1:])[:, t]
                         for x in (b, s, l, v)) for t in range(n_tasks)]

        boxes_all, scores_all, labels_all, valid_all = [], [], [], []
        label_offset = 0
        for task_id, (b, s, l, v) in enumerate(sel):
            boxes_all.append(b)
            scores_all.append(s)
            labels_all.append(jnp.where(v, l + label_offset, 0))
            valid_all.append(v)
            label_offset += self.num_classes[task_id]

        return self._merge_tasks(boxes_all, scores_all, labels_all,
                                 valid_all, test_cfg)

    def _merge_tasks(self, boxes_all, scores_all, labels_all, valid_all,
                     test_cfg):
        """Concatenate per-task detections; honor ``max_per_img``.

        Reference configs set max_per_img (e.g. examples/cbgs config:205
        = 500) though the torch head never reads the key; here it is a
        real global cross-task score cap so serving payloads are bounded
        at the config's stated size (fixed-shape top_k, jit-friendly)."""
        out = {
            "box3d_lidar": jnp.concatenate(boxes_all, axis=1),
            "scores": jnp.concatenate(scores_all, axis=1),
            "label_preds": jnp.concatenate(labels_all, axis=1),
            "valid": jnp.concatenate(valid_all, axis=1),
        }
        mpi = int((test_cfg.get("max_per_img", 0) if isinstance(test_cfg, dict)
                   else getattr(test_cfg, "max_per_img", 0)) or 0)
        d = out["scores"].shape[1]
        if 0 < mpi < d:
            masked = jnp.where(out["valid"], out["scores"], -jnp.inf)
            _, idx = jax.lax.top_k(masked, mpi)
            out = {
                "box3d_lidar": jnp.take_along_axis(
                    out["box3d_lidar"], idx[..., None], axis=1),
                "scores": jnp.take_along_axis(out["scores"], idx, axis=1),
                "label_preds": jnp.take_along_axis(out["label_preds"], idx,
                                                   axis=1),
                "valid": jnp.take_along_axis(out["valid"], idx, axis=1),
            }
        return out

    def predict_tta(self, example: Dict[str, Any], preds_dicts: List[dict],
                    test_cfg) -> Dict[str, jnp.ndarray]:
        """Double-flip test-time augmentation merge.

        ``example``/``preds_dicts`` come from a forward over the 4-variant
        stacked batch [identity, y-flip, x-flip, xy-flip] of size 4B (built
        by make_predict_step when test_cfg['double_flip'] is set). Each
        variant's decoded candidates are mapped back into the original
        frame (positions/velocities negated, yaw reflected), the direction
        classifier is folded into the yaw in the variant's own frame, and
        one NMS runs over the union of the 4 candidate sets per sample.

        Parity role: the reference's flip TTA surface (pipelines/
        test_aug.py:8 MultiScaleFlipAug; preprocess.py:202-206 notes the
        nuScenes double flip) — redesigned as a single fixed-shape jitted
        ensemble instead of per-variant python passes.
        """
        nv = 4
        # per-variant sign conventions: variant order [id, yflip, xflip, xy]
        flip_x = np.array([False, False, True, True])
        flip_y = np.array([False, True, False, True])

        boxes_all, scores_all, labels_all, valid_all = [], [], [], []
        label_offset = 0
        for task_id, preds in enumerate(preds_dicts):
            reg, scores, labels, dirs, offs = self._task_candidates(
                example, preds, task_id, test_cfg)
            if self.use_direction_classifier:
                opp = jnp.logical_xor(
                    (reg[..., -1] - self.direction_offset) > 0,
                    dirs.astype(bool))
                reg = reg.at[..., -1].add(jnp.where(opp, np.pi, 0.0))

            b4, a = reg.shape[0], reg.shape[1]
            assert b4 % nv == 0, (b4, nv)
            bsz = b4 // nv
            reg = reg.reshape(nv, bsz, a, -1)
            # de-flip positions / velocity / yaw per variant
            sx = jnp.asarray(np.where(flip_x, -1.0, 1.0),
                             reg.dtype)[:, None, None]
            sy = jnp.asarray(np.where(flip_y, -1.0, 1.0),
                             reg.dtype)[:, None, None]
            reg = reg.at[..., 0].multiply(sx)
            reg = reg.at[..., 1].multiply(sy)
            if self.anchor_dim >= 9:                 # [.., vx, vy, yaw]
                reg = reg.at[..., 6].multiply(sx)
                reg = reg.at[..., 7].multiply(sy)
            yaw = reg[..., -1]
            fy = jnp.asarray(flip_y)[:, None, None]
            fx = jnp.asarray(flip_x)[:, None, None]
            yaw = jnp.where(fy, -yaw, yaw)
            yaw = jnp.where(fx, np.pi - yaw, yaw)
            reg = reg.at[..., -1].set(yaw)

            def merge(x):
                x = x.reshape(nv, bsz, *x.shape[1:])
                x = jnp.moveaxis(x, 0, 1)            # (B, nv, A, ...)
                return x.reshape(bsz, nv * a, *x.shape[3:])

            reg = jnp.moveaxis(reg, 0, 1).reshape(bsz, nv * a, -1)
            scores = merge(scores)
            labels = merge(labels)
            dirs = merge(dirs)
            offs = merge(offs)
            b, s, l, v = self._nms_select(reg, scores, labels, dirs, offs,
                                          test_cfg, apply_dir=False)
            boxes_all.append(b)
            scores_all.append(s)
            labels_all.append(jnp.where(v, l + label_offset, 0))
            valid_all.append(v)
            label_offset += self.num_classes[task_id]

        return self._merge_tasks(boxes_all, scores_all, labels_all,
                                 valid_all, test_cfg)
