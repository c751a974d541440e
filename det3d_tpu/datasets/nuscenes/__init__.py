from det3d_tpu.datasets.nuscenes.nuscenes import NuScenesDataset

__all__ = ["NuScenesDataset"]
