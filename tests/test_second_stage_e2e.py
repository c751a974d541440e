"""Two-stage refinement composes end-to-end: noisy first-stage boxes ->
on-device point crops -> PointModule features -> RegHead -> trained z/h
residual regression recovers the truth.

Parity narrative: the reference's RCNN experiment glue
(cropped_voxel_encoder.crop2assign + PointModule + RegHead) as one jitted
program over `crop_detections`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from det3d_tpu.models.necks import PointModule
from det3d_tpu.models.second_stage import RegHead, crop_detections
from flax import linen as nn


class Refiner(nn.Module):
    """Crop encoder + per-RoI pointnet + z/h head, one jitted program."""
    sampled: int = 64

    @nn.compact
    def __call__(self, points, boxes, train: bool = False):
        crops, empty = crop_detections(points, None, boxes,
                                       pool_extra_width=0.5,
                                       sampled_pt_num=self.sampled)
        b, m = crops.shape[:2]
        flat = crops.reshape(b * m, self.sampled * 3)
        feats = PointModule(num_input_features=self.sampled * 3,
                            layers=(64, 32))(flat, train=train)
        preds = RegHead(tasks=[dict(num_class=1, class_names=["Car"])],
                        anchor_height=1.56, anchor_center=-1.0)(
                            feats, train=train)
        return [p.reshape(b, m, 2) for p in preds], empty


def _scene(rng, b=4, m=3, n=512):
    pts = np.zeros((b, n, 3), np.float32)
    gt = np.zeros((b, m, 7), np.float32)
    noisy = np.zeros((b, m, 7), np.float32)
    resid = np.zeros((b, m, 2), np.float32)          # (dz, dh)
    for i in range(b):
        for j in range(m):
            cx, cy = rng.uniform(-8, 8, 2)
            dz = rng.uniform(-0.3, 0.3)
            dh = rng.uniform(-0.2, 0.2)
            true_z, true_h = -1.0 + dz, 1.56 + dh
            gt[i, j] = [cx, cy, true_z, 1.6, 3.9, true_h, 0.0]
            # first stage got x/y right but z/h at the anchor values
            noisy[i, j] = [cx, cy, -1.0, 1.6, 3.9, 1.56, 0.0]
            resid[i, j] = [dz, dh]
            k = n // m
            local = rng.uniform([-1.8, -0.7, -true_h / 2],
                                [1.8, 0.7, true_h / 2], (k, 3))
            pts[i, j * k:(j + 1) * k] = local + [cx, cy, true_z]
    return pts, noisy, resid


def test_second_stage_learns_zh_residuals(rng):
    pts, noisy, resid = _scene(rng)
    pts_j, boxes_j = jnp.asarray(pts), jnp.asarray(noisy)
    target = jnp.asarray(resid)

    model = Refiner()
    variables = model.init(jax.random.PRNGKey(0), pts_j, boxes_j,
                           train=False)
    tx = optax.adam(3e-3)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state):
        def loss_fn(p):
            (preds, _), new_bs = model.apply(
                {"params": p, "batch_stats": bs}, pts_j, boxes_j,
                train=True, mutable=["batch_stats"])
            err = preds[0] - target
            return jnp.mean(err ** 2), new_bs["batch_stats"]

        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    losses = []
    for _ in range(300):
        params, bs, opt_state, loss = step(params, bs, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])

    (preds, empty), _ = model.apply({"params": params, "batch_stats": bs},
                                    pts_j, boxes_j, train=False,
                                    mutable=["batch_stats"])
    assert not np.asarray(empty).any()
    err = np.abs(np.asarray(preds[0]) - resid)
    assert err.mean() < 0.06, err.mean()


def test_reghead_loss_composes_with_refiner(rng):
    pts, noisy, resid = _scene(rng, b=2, m=2)
    model = Refiner()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(noisy), train=False)
    (preds, _), _ = model.apply(variables, jnp.asarray(pts),
                                jnp.asarray(noisy), train=False,
                                mutable=["batch_stats"])
    head = RegHead(tasks=[dict(num_class=1, class_names=["Car"])],
                   iou_loss=True)
    n = 4
    example = dict(
        targets=jnp.asarray(np.concatenate(
            [np.zeros((n, 2)), resid[:2].reshape(n, 2),
             np.zeros((n, 1))], -1).astype(np.float32)),
        ground_plane=jnp.full((n,), -1.78, jnp.float32))
    losses = head.loss(example, [preds[0].reshape(n, 1, 1, 2)])
    assert np.isfinite(float(losses[0]["loss"]))
