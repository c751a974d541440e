"""Host voxelization twins (ops/voxelize_host.py): raw equality against
the device voxelizer, and the serving predict-step passthrough."""

import numpy as np
import jax.numpy as jnp
import pytest

from det3d_tpu.core.voxelize import VoxelGenerator
from det3d_tpu.ops.voxelize_host import host_voxelize_batch

VG_KW = dict(voxel_size=[0.1, 0.1, 0.2],
             point_cloud_range=[0, -4.0, -1.0, 7.2, 4.0, 1.2],
             max_num_points=5, max_voxels=600)


def _clouds(rng, b=2, p=900):
    # spread past the range so some points are out of bounds (sentinels)
    pts = rng.uniform([0, -4.4, -1.2, 0], [8.0, 4.4, 1.4, 1.0],
                      size=(b, p, 4)).astype(np.float32)
    n = np.asarray([p, p // 3], np.int32)[:b]
    return pts, n


KEYMAP = {"voxels": "voxels", "coordinates": "coords",
          "num_points_per_voxel": "num_points_per_voxel",
          "num_voxels": "num_voxels"}


@pytest.mark.parametrize("order,fuse_mean", [("appearance", False),
                                             ("hashed", False),
                                             ("yxz", False),
                                             ("hashed", True),
                                             ("yxz", True)])
def test_host_voxelize_matches_device(rng, order, fuse_mean):
    vg = VoxelGenerator(order=order, fuse_mean=fuse_mean, **VG_KW)
    pts, n = _clouds(rng)
    host = host_voxelize_batch(pts, n, vg)
    dev = vg.generate_batch(jnp.asarray(pts), jnp.asarray(n))
    for hk, dk in KEYMAP.items():
        np.testing.assert_array_equal(host[hk], np.asarray(dev[dk]),
                                      err_msg=f"{order} fuse={fuse_mean} "
                                              f"{hk}")


def test_host_voxelize_degenerate(rng):
    """Empty cloud and cap-saturating cloud."""
    vg = VoxelGenerator(order="hashed", fuse_mean=False,
                        **dict(VG_KW, max_voxels=64))
    pts, _ = _clouds(rng)
    n = np.asarray([0, pts.shape[1]], np.int32)
    host = host_voxelize_batch(pts, n, vg)
    dev = vg.generate_batch(jnp.asarray(pts), jnp.asarray(n))
    for hk, dk in KEYMAP.items():
        np.testing.assert_array_equal(host[hk], np.asarray(dev[dk]),
                                      err_msg=hk)
    assert host["num_voxels"][0] == 0


def test_predict_with_host_voxels_matches(rng):
    """host_plan_fn(voxelize=True): the jitted predict step consumes the
    host-voxelized example and returns identical detections (the serving
    contract bench.py times)."""
    import optax
    from det3d_tpu.apis.train import host_plan_fn
    from det3d_tpu.parallel.train import TrainState, make_predict_step
    from tests.test_host_plan import _tiny_second_stack

    model, vg, assigner, jbatch, jbatch_plan, variables = \
        _tiny_second_stack(rng, plan_train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              optax.sgd(1e-3))
    test_cfg = dict(
        nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
                 nms_pre_max_size=100, nms_post_max_size=30,
                 nms_iou_threshold=0.5),
        score_threshold=0.05,
        post_center_limit_range=[0, -8.0, -5.0, 16.0, 8.0, 5.0],
        max_per_img=20,
    )
    step = make_predict_step(model, vg, [assigner], [[1]], test_cfg)
    data = {"points": jbatch["points"], "num_points": jbatch["num_points"]}

    out_ref = step(state, data)

    fn = host_plan_fn(model, vg, train=False, voxelize=True)
    plan = fn(np.asarray(data["points"]), np.asarray(data["num_points"]))
    assert "voxels" in plan and "point_lin" not in plan
    out_hv = step(state, dict(data, **{k: jnp.asarray(v)
                                       for k, v in plan.items()}))
    for k in out_ref:
        np.testing.assert_array_equal(np.asarray(out_hv[k]),
                                      np.asarray(out_ref[k]), err_msg=k)


def test_dense_model_host_voxelize(rng):
    """Dense (pillar) models get a voxel-only plan; appearance order."""
    from det3d_tpu.apis.train import host_plan_fn

    vg = VoxelGenerator(order="appearance", **VG_KW)

    class Model:
        backbone = object()

    assert host_plan_fn(Model(), vg) is None
    fn = host_plan_fn(Model(), vg, voxelize=True)
    pts, n = _clouds(rng)
    plan = fn(pts, n)
    assert set(plan) == {"voxels", "coordinates", "num_points_per_voxel",
                         "num_voxels"}
    dev = vg.generate_batch(jnp.asarray(pts), jnp.asarray(n))
    np.testing.assert_array_equal(plan["voxels"], np.asarray(dev["voxels"]))
