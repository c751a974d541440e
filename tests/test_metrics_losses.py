"""Streaming metrics + extended loss zoo: golden/NumPy-oracle checks."""

import numpy as np
import jax.numpy as jnp


def test_streaming_accuracy_precision_recall():
    from det3d_tpu.models.metrics import Accuracy, Precision, Recall, Scalar

    # Accuracy with background-as-zeros: logits (N, A, C)
    acc = Accuracy(threshold=0.5)
    st = acc.init()
    logits = jnp.asarray([[[3.0], [-2.0], [0.2]]])    # preds -> [1, 0, 1]
    labels = jnp.asarray([[1, 0, 1]])
    st, v = acc.update(st, labels, logits)
    assert abs(float(v) - 1.0) < 1e-6
    # streaming: second batch 2/3 correct lowers the running value
    st, v = acc.update(st, jnp.asarray([[1, 0, 0]]),
                       jnp.asarray([[[-3.0], [-3.0], [-3.0]]]))
    assert abs(float(v) - 5.0 / 6) < 1e-6

    # Precision / Recall on 1-logit BCE preds
    prec, rec = Precision(), Recall()
    ps, rs = prec.init(), rec.init()
    logits = jnp.asarray([[[2.0], [2.0], [-2.0], [-2.0]]])
    labels = jnp.asarray([[1, 0, 1, 0]])              # tp=1 fp=1 fn=1 tn=1
    ps, pv = prec.update(ps, labels, logits)
    rs, rv = rec.update(rs, labels, logits)
    assert abs(float(pv) - 0.5) < 1e-6
    assert abs(float(rv) - 0.5) < 1e-6

    sc = Scalar()
    ss = sc.init()
    ss, _ = sc.update(ss, jnp.asarray(2.0))
    ss, _ = sc.update(ss, jnp.asarray(0.0))           # ignored (zero)
    ss, v = sc.update(ss, jnp.asarray(4.0))
    assert abs(float(v) - 3.0) < 1e-6


def test_precision_recall_multi_threshold():
    from det3d_tpu.models.metrics import PrecisionRecall

    m = PrecisionRecall(thresholds=(0.3, 0.7))
    st = m.init()
    # sigmoid(2.0)=0.88, sigmoid(-1)=0.27, sigmoid(0.5)=0.62
    logits = jnp.asarray([[[2.0], [-1.0], [0.5]]])
    labels = jnp.asarray([[1, 0, 1]])
    st, (prec, rec) = m.update(st, labels, logits)
    # thr 0.3: preds [1,0,1] -> tp=2 fp=0 fn=0
    assert abs(float(prec[0]) - 1.0) < 1e-6 and abs(float(rec[0]) - 1.0) < 1e-6
    # thr 0.7: preds [1,0,0] -> tp=1 fp=0 fn=1
    assert abs(float(prec[1]) - 1.0) < 1e-6 and abs(float(rec[1]) - 0.5) < 1e-6


def test_balanced_l1_matches_formula():
    from det3d_tpu.models.losses import BalancedL1Loss

    loss = BalancedL1Loss(alpha=0.5, gamma=1.5, beta=1.0)
    pred = jnp.asarray([[0.3, 2.5]])
    target = jnp.asarray([[0.0, 0.0]])
    out = np.asarray(loss(pred, target))
    b = np.e ** (1.5 / 0.5) - 1
    d = 0.3
    exp_small = 0.5 / b * (b * d + 1) * np.log(b * d + 1) - 0.5 * d
    d = 2.5
    exp_large = 1.5 * d + 1.5 / b - 0.5
    np.testing.assert_allclose(out[0], [exp_small, exp_large], rtol=1e-5)


def test_iou_and_bounded_iou_loss():
    from det3d_tpu.models.losses import IoULoss, BoundedIoULoss

    pred = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
    target = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
    out = np.asarray(IoULoss()(pred, target))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)   # IoU 1 -> loss 0

    out_b = np.asarray(BoundedIoULoss()(pred, target))
    np.testing.assert_allclose(out_b, 0.0, atol=1e-6)

    shifted = jnp.asarray([[1.0, 0.0, 10.0, 9.0]])
    assert float(np.asarray(IoULoss()(pred, shifted)).sum()) > 0.05
    assert float(np.asarray(BoundedIoULoss()(pred, shifted)).sum()) > 0.01


def test_ghm_losses_finite_and_weighting():
    from det3d_tpu.models.losses import GHMCLoss, GHMRLoss

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.normal(0, 2, (2, 16, 3)).astype(np.float32))
    target = jnp.asarray((rng.uniform(0, 1, (2, 16, 3)) > 0.7)
                         .astype(np.float32))
    w = jnp.ones((2, 16))
    out = np.asarray(GHMCLoss(bins=10)(logits, target, w))
    assert out.shape == (2, 16, 3) and np.all(np.isfinite(out))
    assert out.sum() > 0

    pred = jnp.asarray(rng.normal(0, 1, (2, 16, 7)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 1, (2, 16, 7)).astype(np.float32))
    out_r = np.asarray(GHMRLoss(mu=0.02, bins=10)(pred, tgt, w))
    assert out_r.shape == (2, 16, 7) and np.all(np.isfinite(out_r))
    assert out_r.sum() > 0


def test_bootstrapped_sigmoid_interpolates():
    from det3d_tpu.models.losses import (
        BootstrappedSigmoidClassificationLoss,
        _sigmoid_cross_entropy_with_logits)

    logits = jnp.asarray([[[2.0, -1.0]]])
    target = jnp.asarray([[[1.0, 0.0]]])
    w = jnp.ones((1, 1))
    # alpha=1 -> plain sigmoid CE
    full = BootstrappedSigmoidClassificationLoss(alpha=1.0)(logits, target, w)
    plain = _sigmoid_cross_entropy_with_logits(target, logits)
    np.testing.assert_allclose(np.asarray(full), np.asarray(plain), rtol=1e-6)
    # soft/hard differ for alpha<1
    soft = BootstrappedSigmoidClassificationLoss(alpha=0.5)(logits, target, w)
    hard = BootstrappedSigmoidClassificationLoss(
        alpha=0.5, bootstrap_type="hard")(logits, target, w)
    assert not np.allclose(np.asarray(soft), np.asarray(hard))
