"""Detector compositions: reader -> backbone -> neck -> bbox_head.

Parity: reference det3d/models/detectors/base.py:10-70,
single_stage.py:9-74, voxelnet.py:6-52, point_pillars.py:6-54. The TPU
detectors are flax modules over the batched-padded example layout; train
loss / prediction orchestration stays in the head (as in the reference) and
is reachable through the unbound ``loss``/``predict`` helpers here.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from det3d_tpu.models.registry import DETECTORS


class SingleStageDetector(nn.Module):
    """Shared composition logic (reference: detectors/single_stage.py:9-74)."""
    reader: Any = None
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    grid_size: Optional[Tuple[int, int, int]] = None  # (nx, ny, nz), static
    pretrained: Optional[str] = None

    @property
    def with_neck(self) -> bool:
        return self.neck is not None

    def loss(self, example, preds):
        return self.bbox_head.loss(example, preds)

    def predict(self, example, preds, test_cfg=None):
        return self.bbox_head.predict(example, preds,
                                      test_cfg or self.test_cfg)

    def predict_tta(self, example, preds, test_cfg=None):
        return self.bbox_head.predict_tta(example, preds,
                                          test_cfg or self.test_cfg)


@DETECTORS.register_module
class PointPillars(SingleStageDetector):
    """Parity: detectors/point_pillars.py:6-54."""

    @nn.compact
    def __call__(self, voxels, num_points, coors, train: bool = False):
        feats = self.reader(voxels, num_points, coors, train=train)   # (B,V,U)
        x = self.backbone(feats, coors, self.grid_size, train=train)  # canvas
        if self.neck is not None:
            x = self.neck(x, train=train)
        return self.bbox_head(x, train=train)


@DETECTORS.register_module
class VoxelNet(SingleStageDetector):
    """Parity: detectors/voxelnet.py:6-52 (SECOND / CBGS family)."""

    @nn.compact
    def __call__(self, voxels, num_points, coors, train: bool = False,
                 plan=None):
        # ``plan``: optional host-precomputed packed rulebooks for the
        # sparse middle (ops/sparse_host.py) — zero device-side rulebook
        # construction when the input pipeline ships one.
        feats = self.reader(voxels, num_points, train=train)          # (B,V,C)
        kw = {} if plan is None else {"plan": plan}
        x = self.backbone(feats, coors, self.grid_size, train=train, **kw)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return self.bbox_head(x, train=train)
