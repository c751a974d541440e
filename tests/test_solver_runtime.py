"""Solver schedules and runtime checkpoint finetune-load."""

import numpy as np

import jax.numpy as jnp

from det3d_tpu.solver.schedules import (build_lr_schedule, exponential_decay,
                                        manual_stepping, one_cycle)


def test_one_cycle_shape():
    lr_fn, mom_fn = one_cycle(0.003, 100, moms=(0.95, 0.85), div_factor=10.0,
                              pct_start=0.4)
    lrs = np.array([float(lr_fn(s)) for s in range(100)])
    moms = np.array([float(mom_fn(s)) for s in range(100)])
    assert abs(lrs[0] - 0.0003) < 1e-5           # lr_max / div_factor
    assert abs(lrs.max() - 0.003) < 1e-4         # peak at pct_start
    assert np.argmax(lrs) == 40
    assert lrs[-1] < lrs[0]                      # final annealed below start
    assert abs(moms[0] - 0.95) < 1e-6 and abs(moms.min() - 0.85) < 1e-3


def test_exponential_and_manual():
    lr_fn = exponential_decay(0.01, total_step=100, decay_length=0.1,
                              decay_factor=0.8)
    assert abs(float(lr_fn(0)) - 0.01) < 1e-8
    assert float(lr_fn(50)) < float(lr_fn(10))

    lr_fn = manual_stepping(100, boundaries=[0.5, 0.8],
                            rates=[1e-3, 1e-4, 1e-5])
    assert abs(float(lr_fn(10)) - 1e-3) < 1e-9
    assert abs(float(lr_fn(60)) - 1e-4) < 1e-9
    assert abs(float(lr_fn(90)) - 1e-5) < 1e-9

    lr_fn, mom_fn = build_lr_schedule(
        dict(type="one_cycle", lr_max=0.002, moms=[0.95, 0.85],
             div_factor=10.0, pct_start=0.4), 50)
    assert float(lr_fn(20)) > 0


def test_weights_only_finetune_load(tmp_path):
    import optax
    from det3d_tpu.parallel.train import TrainState
    from det3d_tpu.runtime.checkpoint import CheckpointManager, load_weights

    tx = optax.adam(1e-3)
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = TrainState.create(params, {"bn": jnp.ones((1,))}, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, meta={"iter": 7})
    mgr.close()

    fresh = TrainState.create(
        {"w": jnp.zeros((3,)), "b": jnp.ones((2,))},
        {"bn": jnp.zeros((1,))}, tx)
    loaded = load_weights(fresh, str(tmp_path / "ckpt"))
    np.testing.assert_allclose(np.asarray(loaded.params["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(loaded.batch_stats["bn"]), 1.0)
    # optimizer state and step stay fresh (finetune semantics)
    assert int(loaded.step) == 0


def test_weights_npz_roundtrip_and_url_load(tmp_path):
    """Portable .npz weights export loads back locally AND through the
    URL dispatch path (file:// exercises the same download-to-cache code
    http(s):// uses; reference checkpoint.py:121-174 parity)."""
    import optax
    from det3d_tpu.parallel.train import TrainState
    from det3d_tpu.runtime.checkpoint import load_weights, save_weights_npz

    tx = optax.adam(1e-3)
    params = {"layer": {"w": jnp.full((3, 2), 2.5), "b": jnp.ones((2,))}}
    state = TrainState.create(params, {"bn": {"mean": jnp.ones((4,))}}, tx)
    path = tmp_path / "weights.npz"
    save_weights_npz(state, str(path))

    fresh = TrainState.create(
        {"layer": {"w": jnp.zeros((3, 2)), "b": jnp.zeros((2,))}},
        {"bn": {"mean": jnp.zeros((4,))}}, tx)
    loaded = load_weights(fresh, str(path))
    np.testing.assert_allclose(np.asarray(loaded.params["layer"]["w"]), 2.5)
    np.testing.assert_allclose(np.asarray(loaded.batch_stats["bn"]["mean"]),
                               1.0)

    loaded2 = load_weights(fresh, path.as_uri())       # file:// URL
    np.testing.assert_allclose(np.asarray(loaded2.params["layer"]["b"]), 1.0)

    # a template key absent from the file is an explicit error
    bigger = TrainState.create(
        {"layer": {"w": jnp.zeros((3, 2))}, "extra": jnp.zeros((1,))},
        {}, tx)
    try:
        load_weights(bigger, str(path))
        assert False, "expected KeyError for missing params"
    except KeyError:
        pass


def test_tfevents_writer_readable_by_tensorboard(tmp_path):
    """Event files from the dependency-free writer must parse with the real
    TensorBoard reader (crc framing + proto encoding)."""
    from det3d_tpu.utils.tfevents import TfEventWriter, _crc32c

    # CRC32C known-answer test (RFC 3720 vector)
    assert _crc32c(b"123456789") == 0xE3069283

    w = TfEventWriter(str(tmp_path))
    for step in range(5):
        w.add_scalar("train/loss", 10.0 - step, step)
        w.add_scalar("train/lr", 1e-3 * (step + 1), step)
    w.close()

    from tensorboard.backend.event_processing import event_accumulator
    event_file = next(tmp_path.glob("events.out.tfevents.*"))
    acc = event_accumulator.EventAccumulator(str(event_file))
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"train/loss", "train/lr"}
    loss = acc.Scalars("train/loss")
    assert [e.step for e in loss] == list(range(5))
    assert abs(loss[0].value - 10.0) < 1e-6
    assert abs(loss[4].value - 6.0) < 1e-6
    lr = acc.Scalars("train/lr")
    assert abs(lr[2].value - 3e-3) < 1e-9


def test_mmcv_policy_zoo():
    """Policies match the reference hook formulas (hooks/lr_updater.py).

    Oracle: hand-evaluated get_lr at specific progress points, with
    by_epoch=True progress = step // steps_per_epoch.
    """
    from det3d_tpu.solver.schedules import (cosine_lr, exp_lr, fixed_lr,
                                            inv_lr, poly_lr, step_lr,
                                            with_warmup)

    assert abs(float(fixed_lr(0.02)(123)) - 0.02) < 1e-9

    # step: milestones [8, 11] epochs, gamma 0.1, 10 steps/epoch
    fn = step_lr(0.01, [8, 11], gamma=0.1, steps_per_epoch=10)
    assert abs(float(fn(0)) - 0.01) < 1e-9
    assert abs(float(fn(79)) - 0.01) < 1e-9       # epoch 7
    assert abs(float(fn(80)) - 0.001) < 1e-9      # epoch 8
    assert abs(float(fn(110)) - 0.0001) < 1e-10   # epoch 11
    # int milestone: gamma^(progress // step)
    fn = step_lr(0.01, 3, gamma=0.5, steps_per_epoch=1)
    assert abs(float(fn(7)) - 0.01 * 0.5 ** 2) < 1e-9

    fn = exp_lr(0.01, 0.9, steps_per_epoch=5)
    assert abs(float(fn(10)) - 0.01 * 0.9 ** 2) < 1e-9

    fn = poly_lr(0.01, total_step=100, power=2.0, min_lr=0.001)
    assert abs(float(fn(0)) - 0.01) < 1e-8
    assert abs(float(fn(50)) - ((0.01 - 0.001) * 0.25 + 0.001)) < 1e-8
    assert abs(float(fn(100)) - 0.001) < 1e-8

    fn = inv_lr(0.01, gamma=0.1, power=0.75)
    assert abs(float(fn(20)) - 0.01 * 3.0 ** -0.75) < 1e-8

    fn = cosine_lr(0.01, total_step=100, target_lr=0.002)
    assert abs(float(fn(0)) - 0.01) < 1e-8
    assert abs(float(fn(50)) - (0.002 + 0.5 * 0.008)) < 1e-8
    assert abs(float(fn(100)) - 0.002) < 1e-8

    # warmups scale the regular lr below warmup_iters, exact at/after it
    base = fixed_lr(0.01)
    wc = with_warmup(base, "constant", 10, 0.25)
    assert abs(float(wc(3)) - 0.0025) < 1e-9
    assert abs(float(wc(10)) - 0.01) < 1e-9
    wl = with_warmup(base, "linear", 10, 0.1)
    # k = 1 - (1 - cur/iters)(1 - ratio) at cur=5: 1 - 0.5*0.9 = 0.55
    assert abs(float(wl(5)) - 0.0055) < 1e-9
    we = with_warmup(base, "exp", 10, 0.1)
    assert abs(float(we(5)) - 0.01 * 0.1 ** 0.5) < 1e-9


def test_build_lr_schedule_policy_dispatch():
    lr_fn, mom_fn = build_lr_schedule(
        dict(policy="step", step=[8, 11], warmup="linear", warmup_iters=5,
             warmup_ratio=1.0 / 3), total_step=130, steps_per_epoch=10,
        base_lr=0.02)
    assert mom_fn is None
    assert float(lr_fn(0)) < 0.02 * 0.5          # warmup active
    assert abs(float(lr_fn(50)) - 0.02) < 1e-9   # regular, epoch 5
    assert abs(float(lr_fn(85)) - 0.002) < 1e-9  # after first milestone
