from det3d_tpu.datasets.loader.loader import DataLoader, build_dataloader
from det3d_tpu.datasets.loader.sampler import (DistributedGroupSampler,
                                               GroupSampler)

__all__ = ["DataLoader", "build_dataloader", "GroupSampler",
           "DistributedGroupSampler"]
