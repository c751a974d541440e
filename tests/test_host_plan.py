"""Host-precomputed rulebook plans: bit-exactness against the device
builders, and end-to-end train-step equality.

The host plan (ops/sparse_host.py) must reproduce the on-device rulebook
chain EXACTLY — the ranks it ships index into feature rows the device
voxelizer produces — so these tests assert raw array equality of every
packed plan entry against models/backbones.py::build_plan_device, then that
a full train step taken with a host plan matches one taken without, to the
last bit of loss and gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from det3d_tpu.core.voxelize import VoxelGenerator
from det3d_tpu.models import backbones as bb
from det3d_tpu.ops import sparse as sp
from det3d_tpu.ops import sparse_host as sph

# a small but non-trivial grid: depth 11 (<= 32 post-downsample), BEV 80x72
VG_KW = dict(voxel_size=[0.1, 0.1, 0.2], point_cloud_range=[0, -4.0, -1.0,
                                                            7.2, 4.0, 1.2],
             max_num_points=5, max_voxels=600)


def _clouds(rng, b=2, p=900, spread=1.0):
    pts = rng.uniform(
        [0, -4.0, -1.0, 0], [7.2 * spread, 4.0, 1.2, 1.0],
        size=(b, p, 4)).astype(np.float32)
    n = np.asarray([p, p // 3], np.int32)[:b]
    return pts, n


def _host_plan_batch(pts, n, vg, spec, train):
    per = [sph.build_plan(pts[i], n[i],
                          voxel_size=vg.voxel_size,
                          pc_range=vg.point_cloud_range,
                          grid_size=vg.grid_size,
                          max_voxels=vg.max_voxels,
                          order=vg.order, spec=spec, train=train)
           for i in range(pts.shape[0])]
    return {k: np.stack([d[k] for d in per]) for k in per[0]}


class FakeMiddle:
    def __init__(self, **kw):
        self.__dict__.update(kw)


@pytest.mark.parametrize("order,pre_ranked", [("yxz", True),
                                              ("hashed", False)])
@pytest.mark.parametrize("dense_tail,dense_from", [(True, 3), (False, 4)])
def test_plan_matches_device(rng, order, pre_ranked, dense_tail, dense_from):
    vg = VoxelGenerator(order=order, fuse_mean=True, **VG_KW)
    pts, n = _clouds(rng)
    spec = bb.middle_plan_spec(
        FakeMiddle(stage_caps=(1.0, 0.9, 0.8, 0.7), dense_tail=dense_tail,
                   dense_from=dense_from, pre_ranked=pre_ranked),
        (vg.grid_size), vg.max_voxels)

    host = _host_plan_batch(pts, n, vg, spec, train=True)
    vox = vg.generate_batch(jnp.asarray(pts), jnp.asarray(n),
                            lin=jnp.asarray(host["point_lin"]))
    dev = build_dev = jax.jit(
        lambda co: bb.build_plan_device(co, spec, True))(vox["coords"])
    del build_dev
    assert set(dev) == {k[5:] for k in host if k.startswith("plan_")}
    for k, v in dev.items():
        np.testing.assert_array_equal(
            host[f"plan_{k}"], np.asarray(v), err_msg=f"plan key {k}")

    # eval-mode plan: no inverse entries
    host_eval = _host_plan_batch(pts, n, vg, spec, train=False)
    dev_eval = jax.jit(
        lambda co: bb.build_plan_device(co, spec, False))(vox["coords"])
    assert not any(k.startswith("inv") for k in dev_eval)
    assert set(dev_eval) == {k[5:] for k in host_eval
            if k.startswith("plan_")}
    for k, v in dev_eval.items():
        np.testing.assert_array_equal(host_eval[f"plan_{k}"], np.asarray(v),
                                      err_msg=f"plan key {k}")


def test_plan_matches_device_degenerate(rng):
    """Empty cloud and cap-saturating cloud both transport exactly."""
    vg = VoxelGenerator(order="yxz", fuse_mean=True, **dict(VG_KW,
                                                            max_voxels=96))
    pts, _ = _clouds(rng)
    n = np.asarray([0, pts.shape[1]], np.int32)   # empty + saturated
    spec = bb.middle_plan_spec(
        FakeMiddle(stage_caps=(1.0, 1.0, 1.0, 1.0), dense_tail=True,
                   dense_from=3, pre_ranked=True), vg.grid_size,
        vg.max_voxels)
    host = _host_plan_batch(pts, n, vg, spec, train=True)
    vox = vg.generate_batch(jnp.asarray(pts), jnp.asarray(n),
                            lin=jnp.asarray(host["point_lin"]))
    dev = jax.jit(lambda co: bb.build_plan_device(co, spec, True))(
        vox["coords"])
    for k, v in dev.items():
        np.testing.assert_array_equal(host[f"plan_{k}"], np.asarray(v),
                                      err_msg=f"plan key {k}")


def test_point_lin_matches_device_quantize(rng):
    """The host quantization equals the device's on CPU (same fp32 ops);
    on TPU the device consumes the host ids instead of trusting this."""
    from det3d_tpu.core import voxelize as vx
    vg = VoxelGenerator(order="yxz", fuse_mean=True, **VG_KW)
    pts, n = _clouds(rng)
    for i in range(pts.shape[0]):
        host = sph.point_lin(pts[i], n[i], vg.voxel_size,
                             vg.point_cloud_range, vg.grid_size)
        dev = vx._quantize(jnp.asarray(pts[i]), jnp.asarray(n[i]),
                           tuple(vg.voxel_size),
                           tuple(vg.point_cloud_range), vg.grid_size)
        np.testing.assert_array_equal(host, np.asarray(dev))


def _middle_outputs(middle_cls, vg, pts, n, plan, train):
    vox = vg.generate_batch(
        jnp.asarray(pts), jnp.asarray(n),
        lin=None if plan is None else jnp.asarray(plan["point_lin"]))
    feats = vox["voxels"]
    mid = middle_cls(num_input_features=feats.shape[-1],
                     norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01),
                     pre_ranked=(vg.order == "yxz"))
    kw = {}
    if plan is not None:
        kw["plan"] = {k[5:]: jnp.asarray(v) for k, v in plan.items()
                      if k.startswith("plan_")}

    def run(params_rng):
        variables = mid.init(params_rng, feats, vox["coords"], vg.grid_size,
                             train=False, **kw)

        def loss(params):
            y, _ = mid.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, vox["coords"], vg.grid_size, train=train,
                mutable=["batch_stats"], **kw)
            return (y ** 2).mean()

        val, grads = jax.value_and_grad(loss)(variables["params"])
        return val, grads

    return run(jax.random.PRNGKey(0))


@pytest.mark.parametrize("middle_cls,order", [(bb.SpMiddleFHD, "yxz"),
                                              (bb.SpMiddleResNetFHD,
                                               "hashed")])
def test_middle_with_plan_equals_without(rng, middle_cls, order):
    """Forward loss AND gradients are identical with a host plan."""
    vg = VoxelGenerator(order=order, fuse_mean=True, **VG_KW)
    pts, n = _clouds(rng)
    spec = bb.middle_plan_spec(
        FakeMiddle(stage_caps=(1.0, 1.0, 1.0, 1.0), dense_tail=True,
                   dense_from=3, pre_ranked=(order == "yxz")),
        vg.grid_size, vg.max_voxels)
    plan = _host_plan_batch(pts, n, vg, spec, train=True)

    val_ref, grads_ref = _middle_outputs(middle_cls, vg, pts, n, None, True)
    val_pl, grads_pl = _middle_outputs(middle_cls, vg, pts, n, plan, True)
    np.testing.assert_allclose(np.asarray(val_pl), np.asarray(val_ref),
                               rtol=0, atol=0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=0,
                                                atol=0),
        grads_pl, grads_ref)


def _tiny_second_stack(rng, plan_train=True):
    """A tiny VoxelNet/SpMiddleFHD stack + synthetic batch shared by the
    end-to-end plan-equality tests. Returns (model, vg, assigner, jbatch,
    jbatch_plan, variables)."""
    from det3d_tpu.core.anchors import AnchorGeneratorRange, GroundBox3dCoder
    from det3d_tpu.core.target import TargetAssigner
    from det3d_tpu.models.builder import build_detector
    from det3d_tpu.parallel.train import build_example

    vg = VoxelGenerator(voxel_size=(0.2, 0.2, 0.1),
                        point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
                        max_num_points=5, max_voxels=512, order="yxz",
                        fuse_mean=True)
    grid = vg.grid_size
    model_cfg = dict(
        type="VoxelNet",
        reader=dict(type="VoxelFeatureExtractorV3", num_input_features=4),
        backbone=dict(type="SpMiddleFHD", num_input_features=4,
                      pre_ranked=True),
        neck=dict(type="RPN", layer_nums=[1], ds_layer_strides=[1],
                  ds_num_filters=[32], us_layer_strides=[1],
                  us_num_filters=[32], num_input_features=128),
        bbox_head=dict(
            type="MultiGroupHead", mode="3d", in_channels=32,
            tasks=[dict(num_class=1, class_names=["Car"])], weights=[1],
            box_coder=dict(type="ground_box3d_coder", n_dim=7,
                           linear_dim=False, encode_angle_vector=False),
            encode_background_as_zeros=True,
            loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0,
                           neg_cls_weight=1.0),
            loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0,
                          loss_weight=1.0),
            loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                           codewise=True, loss_weight=2.0),
            encode_rad_error_by_sin=True,
            loss_aux=dict(type="WeightedSoftmaxClassificationLoss",
                          name="direction_classifier", loss_weight=0.2),
            direction_offset=0.0,
        ),
    )
    model = build_detector(model_cfg, grid_size=grid)
    gen = AnchorGeneratorRange(
        anchor_ranges=[0, -8, -1.0, 16, 8, -1.0], sizes=[1.6, 3.9, 1.56],
        rotations=[0, np.pi / 2], match_threshold=0.45,
        unmatch_threshold=0.3, class_name="Car")
    assigner = TargetAssigner(box_coder=GroundBox3dCoder(),
                              anchor_generators=[gen])
    assigner.generate_anchors([1, grid[1] // 8, grid[0] // 8])

    b, p = 2, 700
    pts = rng.uniform([0, -8, -3, 0], [16, 8, 1, 1],
                      size=(b, p, 4)).astype(np.float32)
    gt = np.zeros((b, 4, 7), np.float32)
    gt[:, 0] = [5.0, -3.0, -1.0, 1.6, 3.9, 1.56, 0.5]
    batch = {"points": pts,
             "num_points": np.full((b,), p, np.int32),
             "gt_boxes": gt,
             "gt_classes": np.asarray([[1, 0, 0, 0]] * b, np.int32),
             "gt_valid": np.asarray([[True, False, False, False]] * b)}
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    spec = bb.middle_plan_spec(model.backbone, grid, vg.max_voxels)
    plan = _host_plan_batch(pts, batch["num_points"], vg, spec,
                            train=plan_train)
    jbatch_plan = dict(jbatch, **{k: jnp.asarray(v) for k, v in plan.items()})

    example = build_example(jbatch, vg, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    return model, vg, assigner, jbatch, jbatch_plan, variables


def test_train_step_with_plan_matches_without(rng):
    """Full jitted train step (voxelize + targets + fwd/bwd + optimizer):
    identical losses and updated params with and without a host plan."""
    from det3d_tpu.parallel.train import TrainState, make_train_step
    import optax

    model, vg, assigner, jbatch, jbatch_plan, variables = \
        _tiny_second_stack(rng)
    tx = optax.sgd(1e-3)

    def run(bat):
        # fresh buffers: the jitted step donates the state
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        state = TrainState.create(fresh["params"],
                                  fresh.get("batch_stats", {}), tx)
        step = make_train_step(model, vg, [assigner], [[1]])
        state, metrics = step(state, bat)
        return state, metrics

    s_ref, m_ref = run(jbatch)
    s_pl, m_pl = run(jbatch_plan)
    np.testing.assert_array_equal(np.asarray(m_pl["loss"]),
                                  np.asarray(m_ref["loss"]))
    np.testing.assert_array_equal(np.asarray(m_pl["grad_norm"]),
                                  np.asarray(m_ref["grad_norm"]))
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(c)),
        s_pl.params, s_ref.params)


def test_predict_step_with_plan_and_serving_helper(rng):
    """The serving path: apis.train.host_plan_fn builds the same plan the
    pipeline stage would, and the jitted predict step returns identical
    detections with and without it (bench.py's plan-fed contract)."""
    from det3d_tpu.apis.train import host_plan_fn
    from det3d_tpu.parallel.train import TrainState, make_predict_step
    import optax

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
        max_per_img=20,             # < post_max: exercises the global cap
    )
    step = make_predict_step(model, vg, [assigner], [[1]], test_cfg)
    data = {"points": jbatch["points"], "num_points": jbatch["num_points"]}

    fn = host_plan_fn(model, vg, train=False)
    assert fn is not None
    plan = fn(np.asarray(data["points"]), np.asarray(data["num_points"]))
    # the helper's plan == the pipeline-built plan key for key
    for k, v in plan.items():
        np.testing.assert_array_equal(
            v, np.asarray(jbatch_plan[k]), err_msg=k)

    out_ref = step(state, data)
    out_pl = step(state, dict(data, **{k: jnp.asarray(v)
                                       for k, v in plan.items()}))
    assert out_ref["scores"].shape[1] == 20        # max_per_img honored
    for k in out_ref:
        np.testing.assert_array_equal(np.asarray(out_pl[k]),
                                      np.asarray(out_ref[k]), err_msg=k)

    # dense models have no plan: the helper declines
    class NoBackbone:
        pass
    assert host_plan_fn(NoBackbone(), vg) is None


def test_hostplan_stage_and_injection(rng):
    """The HostPlan pipeline stage adds the plan keys to a Reformat-style
    example, and apis.train.inject_host_plan wires it into a config's
    train pipeline exactly once."""
    from det3d_tpu.apis.train import inject_host_plan
    from det3d_tpu.datasets.pipelines import HostPlan

    vg = VoxelGenerator(order="yxz", fuse_mean=True, **VG_KW)
    spec = bb.middle_plan_spec(
        FakeMiddle(stage_caps=(1.0, 1.0, 1.0, 1.0), dense_tail=True,
                   dense_from=3, pre_ranked=True), vg.grid_size,
        vg.max_voxels)
    pts, n = _clouds(rng, b=1)
    stage = HostPlan(voxel=dict(voxel_size=vg.voxel_size,
                                pc_range=vg.point_cloud_range,
                                grid_size=vg.grid_size,
                                max_voxels=vg.max_voxels, order="yxz"),
                     spec=spec, train=True)
    example, _ = stage({"points": pts[0], "num_points": n[0]}, None)
    assert "point_lin" in example and "plan_s0" in example
    assert "plan_inv1" in example and "plan_co3" in example

    class FakeModel:
        backbone = bb.SpMiddleFHD(num_input_features=4, pre_ranked=True)

    cfg = {"data": {"train": {"pipeline": [dict(type="Reformat")]}}}
    assert inject_host_plan(cfg, FakeModel(), vg)
    pipe = cfg["data"]["train"]["pipeline"]
    assert pipe[-1]["type"] == "HostPlan"
    assert inject_host_plan(cfg, FakeModel(), vg)      # idempotent
    assert sum(p["type"] == "HostPlan" for p in pipe) == 1

    # opted out / unsupported order -> not injected
    cfg2 = {"host_plan": False,
            "data": {"train": {"pipeline": [dict(type="Reformat")]}}}
    assert not inject_host_plan(cfg2, FakeModel(), vg)
    vg_app = VoxelGenerator(order="appearance", **VG_KW)
    cfg3 = {"data": {"train": {"pipeline": [dict(type="Reformat")]}}}
    assert not inject_host_plan(cfg3, FakeModel(), vg_app)


@pytest.mark.parametrize("order", ["yxz", "hashed"])
@pytest.mark.parametrize("fuse_mean", [True, False])
def test_voxelize_with_host_perm_matches(rng, order, fuse_mean):
    """Device voxelization with the host's (lin, perm) overrides equals
    the self-computed path bit-for-bit (sort replaced by one gather)."""
    vg = VoxelGenerator(order=order, fuse_mean=fuse_mean, **VG_KW)
    pts, n = _clouds(rng)
    ref = vg.generate_batch(jnp.asarray(pts), jnp.asarray(n))
    lin = np.stack([sph.point_lin(pts[i], n[i], vg.voxel_size,
                                  vg.point_cloud_range, vg.grid_size)
                    for i in range(pts.shape[0])])
    perm = np.stack([sph.point_order(lin[i], vg.grid_size,
                                     vg.effective_order)
                     for i in range(pts.shape[0])])
    out = vg.generate_batch(jnp.asarray(pts), jnp.asarray(n),
                            lin=jnp.asarray(lin), perm=jnp.asarray(perm))
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]),
                                      err_msg=k)
