"""HostPlan pipeline stage: build packed sparse-conv rulebooks in the
loader workers.

Runs after Reformat (the example dict already holds the padded cloud) and
adds ``point_lin`` plus the packed ``plan_*`` arrays from
ops/sparse_host.py::build_plan. The jitted train step detects the keys and
skips every device-side rulebook build (models/backbones.py plan path) —
the whole chain (71% of the SECOND forward, tools/probes/probe_fwd_attrib)
moves under the loader's prefetch window.

apis/train.py::train_detector injects this stage automatically for sparse-
middle configs whose voxelizer order supports it (``host_plan = False`` in
the config opts out); it can also be listed explicitly in a pipeline with
the same kwargs.

Parity note: the reference performs voxelization (and spconv performs index
-pair construction) on the host side of the step as well
(det3d/ops/point_cloud/point_cloud_ops.py:7-203 in DataLoader workers).
"""

from __future__ import annotations

from det3d_tpu.datasets.registry import PIPELINES
from det3d_tpu.ops import sparse_host as sph


@PIPELINES.register_module
class HostPlan:
    def __init__(self, voxel=None, spec=None, train=True):
        self.voxel = dict(voxel or {})
        self.spec = spec
        self.train = bool(train)

    def __call__(self, example, info):
        plan = sph.build_plan(
            example["points"], example["num_points"],
            voxel_size=self.voxel["voxel_size"],
            pc_range=self.voxel["pc_range"],
            grid_size=tuple(self.voxel["grid_size"]),
            max_voxels=int(self.voxel["max_voxels"]),
            order=self.voxel["order"],
            spec=self.spec, train=self.train)
        example.update(plan)
        return example, info
