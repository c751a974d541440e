from det3d_tpu.datasets.lyft.lyft import LyftDataset

__all__ = ["LyftDataset"]
