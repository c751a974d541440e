"""Native (C++) host-plan builders vs their numpy twins: raw equality.

csrc/hostplan.cc collapses sparse_host.py's ~40 full-array numpy passes per
stage into single loops; the contract is bit-exactness, checked here by
diffing full plans built with the native path against plans built with the
numpy path (``_hp`` monkeypatched to None). test_host_plan.py separately
asserts the (possibly native) host plan equals the device builders, so
equality is transitive across all three implementations.
"""

import numpy as np
import pytest

from det3d_tpu import csrc
from det3d_tpu.core.voxelize import VoxelGenerator
from det3d_tpu.models import backbones as bb
from det3d_tpu.ops import sparse_host as sph

pytestmark = pytest.mark.skipif(csrc.get_hostplan_lib() is None,
                                reason="native hostplan lib unavailable")

VG_KW = dict(voxel_size=[0.1, 0.1, 0.2],
             point_cloud_range=[0, -4.0, -1.0, 7.2, 4.0, 1.2],
             max_num_points=5, max_voxels=600)


class FakeMiddle:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _plan(pts, n, vg, spec, train):
    return sph.build_plan(pts, n, voxel_size=vg.voxel_size,
                          pc_range=vg.point_cloud_range,
                          grid_size=vg.grid_size, max_voxels=vg.max_voxels,
                          order=vg.order, spec=spec, train=train)


@pytest.mark.parametrize("order,pre_ranked", [("yxz", True),
                                              ("hashed", False)])
@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("npts", [0, 300, 900])
def test_native_plan_equals_numpy(rng, monkeypatch, order, pre_ranked,
                                  train, npts):
    vg = VoxelGenerator(order=order, fuse_mean=True, **VG_KW)
    # spread=1.2 pushes some points out of range (sentinel rows); small
    # max_voxels saturates the cap for the 900-point cloud
    pts = rng.uniform([0, -4.4, -1.2, 0], [8.0, 4.4, 1.4, 1.0],
                      size=(900, 4)).astype(np.float32)
    spec = bb.middle_plan_spec(
        FakeMiddle(stage_caps=(1.0, 0.9, 0.8, 0.7), dense_tail=True,
                   dense_from=3, pre_ranked=pre_ranked),
        vg.grid_size, vg.max_voxels)

    native = _plan(pts, npts, vg, spec, train)
    monkeypatch.setattr(sph, "_hp", lambda: None)
    ref = _plan(pts, npts, vg, spec, train)
    assert set(native) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(native[k], ref[k], err_msg=k)


def test_native_point_order_hash_ties(monkeypatch):
    """Stable tie-breaking: duplicate lin ids and the sentinel tail sort
    identically in both implementations."""
    lin = np.asarray([7, 3, 7, sph.SENTINEL, 3, 12, sph.SENTINEL, 0],
                     np.int32)
    for order in ("hashed", "yxz"):
        native = sph.point_order(lin, (16, 16, 4), order)
        monkeypatch.setattr(sph, "_hp", lambda: None)
        ref = sph.point_order(lin, (16, 16, 4), order)
        monkeypatch.undo()
        np.testing.assert_array_equal(native, ref, err_msg=order)
