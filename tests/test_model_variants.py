"""Reader/backbone/neck/head variants: Nobn + RCNN middles, ablation
readers, PointModule, RegHead + crop second stage."""

import jax
import jax.numpy as jnp
import numpy as np


def _sparse_inputs(rng, v=64, grid=(16, 16, 40)):
    coords = np.stack([rng.randint(0, grid[2], v),
                       rng.randint(0, grid[1], v),
                       rng.randint(0, grid[0], v)], -1).astype(np.int32)
    return (jnp.asarray(rng.randn(1, v, 4).astype(np.float32)),
            jnp.asarray(coords[None]), grid)


def test_nobn_middle_has_no_batch_stats(rng):
    from det3d_tpu.models.backbones import SpMiddleFHDNobn
    feats, coords, grid = _sparse_inputs(rng)
    m = SpMiddleFHDNobn(num_input_features=4)
    variables = m.init(jax.random.PRNGKey(0), feats, coords, grid,
                       train=False)
    assert not variables.get("batch_stats")
    out = m.apply(variables, feats, coords, grid, train=False)
    assert out.shape == (1, 2, 2, 128) and np.isfinite(np.asarray(out)).all()


def test_rcnn_middle_shapes(rng):
    from det3d_tpu.models.backbones import RCNNSpMiddleFHD
    feats, coords, grid = _sparse_inputs(rng)
    m = RCNNSpMiddleFHD(num_input_features=4)
    variables = m.init(jax.random.PRNGKey(0), feats, coords, grid,
                       train=False)
    out, _ = m.apply(variables, feats, coords, grid, train=True,
                     mutable=["batch_stats"])
    assert out.shape == (1, 2, 2, 128)
    # thinner than SpMiddleFHD: one subm conv per stage -> fewer params
    from det3d_tpu.models.backbones import SpMiddleFHD
    full = SpMiddleFHD(num_input_features=4)
    vf = full.init(jax.random.PRNGKey(0), feats, coords, grid, train=False)
    n_rcnn = sum(x.size for x in
                 jax.tree_util.tree_leaves(variables["params"]))
    n_full = sum(x.size for x in jax.tree_util.tree_leaves(vf["params"]))
    assert n_rcnn < n_full


def test_reader_variants_registered():
    import det3d_tpu.models.builder  # noqa: F401 (registration trigger)
    from det3d_tpu.models.registry import BACKBONES, NECKS, READERS
    for name in ("VFEV3_ablation", "SimpleVoxel"):
        assert READERS.get(name) is not None
    for name in ("SpMiddleFHDNobn", "RCNNSpMiddleFHD"):
        assert BACKBONES.get(name) is not None
    assert NECKS.get("PointModule") is not None


def test_point_module(rng):
    from det3d_tpu.models.necks import PointModule
    x = jnp.asarray(rng.randn(6, 2, 2, 8).astype(np.float32))
    m = PointModule(num_input_features=32, layers=(16, 8))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (6, 1, 1, 8)


def test_crop_and_reghead_end_to_end(rng):
    from det3d_tpu.models.second_stage import RegHead, crop_detections
    pts = jnp.asarray(rng.uniform(-5, 5, (2, 256, 3)).astype(np.float32))
    boxes = jnp.asarray(np.array(
        [[[0, 0, -1, 1.6, 3.9, 1.56, 0.3], [2, 2, -1, 1.6, 3.9, 1.56, 0.0]],
         [[1, -1, -1, 1.6, 3.9, 1.56, 1.0], [-2, 2, -1, 1.6, 3.9, 1.56, 0.5]]],
        np.float32))
    crops, empty = crop_detections(pts, None, boxes, sampled_pt_num=32)
    assert crops.shape == (2, 2, 32, 3) and empty.shape == (2, 2)

    head = RegHead(tasks=[dict(num_class=1, class_names=["Car"])],
                   iou_loss=True)
    feats = jnp.asarray(rng.randn(4, 1, 1, 16).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), feats, train=False)
    preds = head.apply(variables, feats, train=False)
    assert len(preds) == 1 and preds[0].shape == (4, 1, 1, 2)

    example = dict(
        targets=jnp.asarray(rng.randn(4, 5).astype(np.float32) * 0.1),
        ground_plane=jnp.zeros((4,), jnp.float32))
    losses = head.loss(example, preds)
    assert set(losses[0]) >= {"loss", "z_loss", "height_loss", "gp_loss",
                              "iou_loss"}
    assert np.isfinite(float(losses[0]["loss"]))

    # perfect prediction -> z/h losses vanish
    zero_preds = [jnp.zeros((4, 1, 1, 2))]
    example0 = dict(targets=jnp.zeros((4, 5)),
                    ground_plane=jnp.full((4,), -1.0 - 1.56))
    l0 = head.loss(example0, zero_preds)
    assert float(l0[0]["z_loss"]) == 0.0
    assert float(l0[0]["height_loss"]) == 0.0
