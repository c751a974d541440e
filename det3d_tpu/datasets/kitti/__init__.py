from det3d_tpu.datasets.kitti.kitti import KittiDataset

__all__ = ["KittiDataset"]
