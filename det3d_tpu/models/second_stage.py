"""Two-stage refinement: crop encoder + z/height RegHead.

Parity: det3d/models/bbox_heads/mg_head.py:233-383 (RegHead — per-task
1x1 conv predicting (z, h) residuals, global max-pool, smooth-L1 z/h/
ground-plane losses with an optional 1-D height-IoU term) and
det3d/models/readers/cropped_voxel_encoder.py (crop2assign — crop the
points of each first-stage detection into a canonical per-RoI sample).

The reference's crop stage is a host-side python loop over detections
(points_in_rbbox per box, re-voxelize, re-batch). Here the crop is the
on-device fixed-budget ``ops.roi.roipool3d`` — every RoI gets a
(sampled_pt_num, 3+C) canonical-frame tensor in one XLA program, so the
second stage stays inside the same jit as the first.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from det3d_tpu.models.registry import HEADS
from det3d_tpu.ops.roi import roipool3d


def crop_detections(points, feats, det_boxes, pool_extra_width=1.0,
                    sampled_pt_num=512, valid=None):
    """First-stage boxes -> canonical per-RoI point crops.

    points (B, N, 3), feats (B, N, C) or None, det_boxes (B, M, 7) ->
    (crops (B, M, S, 3 [+C]), empty (B, M)). The crop encoder half of
    cropped_voxel_encoder.crop2assign, shuffled-loop-free.
    """
    px, pf, empty = roipool3d(points, feats, det_boxes,
                              extra_width=pool_extra_width,
                              sampled_pt_num=sampled_pt_num,
                              canonical=True, valid=valid)
    crops = px if pf is None else jnp.concatenate([px, pf], axis=-1)
    return crops, empty


def _smooth_l1(pred, target, sigma=3.0):
    d = jnp.abs(pred - target)
    s2 = sigma * sigma
    return jnp.where(d < 1.0 / s2, 0.5 * s2 * d * d, d - 0.5 / s2)


@HEADS.register_module
class RegHead(nn.Module):
    """z/height refinement head (mg_head.py:233-383).

    __call__ takes per-crop feature maps (N, H, W, C) (or (N, F)) and
    returns one (N, 1, 1, 2) prediction per task: channel 0 = z residual,
    channel 1 = height residual, both against the crop anchor.
    """
    tasks: Sequence[dict]
    in_channels: int = 128
    mode: str = "z"
    z_type: str = "top"
    iou_loss: bool = False
    anchor_height: float = 1.56
    anchor_center: float = -1.0
    norm_cfg: Optional[dict] = None
    name_str: str = "RegHead"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 2:
            x = x[:, None, None, :]
        rets = []
        for _ in self.tasks:
            out = nn.Dense(2)(x)                          # 1x1 conv
            out = jnp.max(out, axis=(1, 2), keepdims=True)
            rets.append(out)
        return rets

    def loss(self, example, preds):
        """example: dict with targets (N, >=5: [_, _, z, h, gp_resid]) and
        ground_plane (N,). Returns per-task dicts (z/height/gp losses and
        the optional height-IoU term), reduced over the batch."""
        n = example["targets"].shape[0]
        zg = example["targets"][:, 2:3]
        hg = example["targets"][:, 3:4]
        gg = example["targets"][:, 4:5]
        gp = example["ground_plane"].reshape(-1, 1)
        h_a, z_a = self.anchor_height, self.anchor_center

        rets = []
        for pred in preds:
            zt = pred[..., 0].reshape(-1, 1)
            ht = pred[..., 1].reshape(-1, 1)
            if self.z_type == "top":
                z_top = z_a + h_a / 2
                gt = z_top + zt - (h_a + ht) - gp
                yg_t, yg_d = zg + z_top, zg + z_top - (hg + h_a)
                yp_t, yp_d = zt + z_top, zt + z_top - (ht + h_a)
            else:                                         # "center"
                gt = z_a + zt - (h_a + ht) / 2.0 - gp
                yg_t = zg + z_a + (hg + h_a) / 2.0
                yg_d = zg + z_a - (hg + h_a) / 2.0
                yp_t = zt + z_a + (ht + h_a) / 2.0
                yp_d = zt + z_a - (ht + h_a) / 2.0
            z_loss = _smooth_l1(zt, zg).sum() / n
            h_loss = _smooth_l1(ht, hg).sum() / n
            gp_loss = _smooth_l1(gt, gg).sum() / n
            ret = dict(z_loss=z_loss, height_loss=h_loss, gp_loss=gp_loss,
                       loss=z_loss + h_loss + gp_loss)
            if self.iou_loss:
                inter = jnp.minimum(yp_t, yg_t) - jnp.maximum(yp_d, yg_d)
                union = (hg + h_a) + (ht + h_a) - inter
                iou = jnp.clip(inter / union, 0.0, 1.0)
                ret["iou_loss"] = (1.0 - iou).sum() / n
                ret["loss"] = ret["loss"] + ret["iou_loss"]
            rets.append(ret)
        return rets
