"""Dataset / pipeline registries. Parity: det3d/datasets/registry.py:3-4."""

from det3d_tpu.utils.registry import Registry

DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
