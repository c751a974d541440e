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
