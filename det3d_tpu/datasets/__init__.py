from det3d_tpu.datasets import pipelines  # noqa: F401 (register stages)
from det3d_tpu.datasets.builder import build_dataset
from det3d_tpu.datasets.custom import PointCloudDataset
from det3d_tpu.datasets.dataset_wrappers import ConcatDataset, RepeatDataset
from det3d_tpu.datasets.kitti.kitti import KittiDataset
from det3d_tpu.datasets.lyft.lyft import LyftDataset
from det3d_tpu.datasets.nuscenes.nuscenes import NuScenesDataset
from det3d_tpu.datasets.loader import DataLoader, build_dataloader
from det3d_tpu.datasets.registry import DATASETS, PIPELINES

__all__ = [
    "build_dataset", "PointCloudDataset", "ConcatDataset", "RepeatDataset",
    "KittiDataset", "NuScenesDataset", "LyftDataset", "DataLoader", "build_dataloader", "DATASETS",
    "PIPELINES",
]
