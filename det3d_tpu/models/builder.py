"""Model builders. Parity: reference det3d/models/builder.py:16-63."""

from __future__ import annotations

from typing import Optional

from det3d_tpu.utils.registry import build_from_cfg
from det3d_tpu.models.registry import (BACKBONES, DETECTORS, HEADS, LOSSES,
                                       NECKS, READERS)
from det3d_tpu.core.anchors import build_box_coder

# ensure registrations run
from det3d_tpu.models import backbones as _backbones  # noqa: F401
from det3d_tpu.models import detectors as _detectors  # noqa: F401
from det3d_tpu.models import heads as _heads          # noqa: F401
from det3d_tpu.models import image_backbones as _img  # noqa: F401
from det3d_tpu.models import losses as _losses        # noqa: F401
from det3d_tpu.models import necks as _necks          # noqa: F401
from det3d_tpu.models import readers as _readers      # noqa: F401
from det3d_tpu.models import second_stage as _stage2  # noqa: F401


def _clean(cfg: dict) -> dict:
    """Drop reference-config keys that are meaningless here (e.g. logger
    objects baked in config files) and remap flax-reserved names."""
    cfg = dict(cfg)
    cfg.pop("logger", None)
    if "name" in cfg:
        cfg["name_str"] = cfg.pop("name")
    return cfg


def build_reader(cfg, **default_args):
    return build_from_cfg(_clean(cfg), READERS, default_args or None)


def build_backbone(cfg, **default_args):
    return build_from_cfg(_clean(cfg), BACKBONES, default_args or None)


def build_neck(cfg, **default_args):
    return build_from_cfg(_clean(cfg), NECKS, default_args or None)


def build_head(cfg, **default_args):
    cfg = _clean(cfg)
    if isinstance(cfg.get("box_coder"), dict):
        cfg["box_coder"] = build_box_coder(cfg["box_coder"])
    return build_from_cfg(cfg, HEADS, default_args or None)


def build_loss(cfg):
    return build_from_cfg(dict(cfg), LOSSES)


def build_detector(cfg, train_cfg: Optional[dict] = None,
                   test_cfg: Optional[dict] = None,
                   grid_size=None, axis_name: Optional[str] = None):
    """Build a full detector from a reference-schema model config.

    grid_size: static (nx, ny, nz) voxel grid (from the voxel_generator
    config) — needed because TPU canvases have static shapes, whereas the
    reference reads the grid from each batch (pillar_encoder.py:180).
    axis_name: mesh axis for synced BatchNorm (None = per-device stats).
    """
    cfg = dict(cfg)
    det_type = cfg.pop("type")
    cfg.pop("pretrained", None)

    def _axis(sub):
        sub = _clean(sub)
        sub["axis_name"] = axis_name
        return sub

    reader_cfg = _clean(cfg.pop("reader"))
    if reader_cfg.get("type") == "PillarFeatureNet":
        reader_cfg["axis_name"] = axis_name
    reader = build_from_cfg(reader_cfg, READERS)

    backbone = build_from_cfg(_clean(cfg.pop("backbone")), BACKBONES)
    neck = build_from_cfg(_axis(cfg.pop("neck")), NECKS) if "neck" in cfg else None
    head = build_head(cfg.pop("bbox_head"))

    det_cls = DETECTORS.get(det_type)
    if det_cls is None:
        raise KeyError(f"unknown detector {det_type}")
    if grid_size is not None:
        grid_size = tuple(int(g) for g in grid_size)
    return det_cls(reader=reader, backbone=backbone, neck=neck, bbox_head=head,
                   train_cfg=train_cfg, test_cfg=test_cfg, grid_size=grid_size)
