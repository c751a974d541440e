"""Learning-rate / momentum schedules (fastai-style).

Parity: reference det3d/solver/learning_schedules_fastai.py — OneCycle (:77,
cosine-annealed two-phase lr+momentum), ExponentialDecay (:98),
ManualStepping (:132). Here schedules are pure ``step -> value`` functions
(jnp-traceable), composable with optax.inject_hyperparams so the whole
optimizer update stays on device.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def annealing_cos(start: float, end: float, pct):
    """Cosine anneal from start to end as pct goes 0 -> 1 (fastai)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle(lr_max: float, total_step: int, moms: Sequence[float] = (0.95, 0.85),
              div_factor: float = 10.0, pct_start: float = 0.4,
              ) -> Tuple[Callable, Callable]:
    """Returns (lr_fn, mom_fn): two-phase cosine OneCycle.

    Phase 1 [0, pct_start): lr_max/div_factor -> lr_max, mom hi -> lo.
    Phase 2 [pct_start, 1]: lr_max -> lr_max/div_factor/1e4, mom lo -> hi.
    """
    low_lr = lr_max / div_factor
    final_lr = low_lr / 1e4
    a1 = int(total_step * pct_start)
    a1 = max(a1, 1)
    a2 = max(total_step - a1, 1)
    hi_m, lo_m = float(moms[0]), float(moms[1])

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / a1, 0.0, 1.0)
        p2 = jnp.clip((step - a1) / a2, 0.0, 1.0)
        return jnp.where(step < a1,
                         annealing_cos(low_lr, lr_max, p1),
                         annealing_cos(lr_max, final_lr, p2))

    def mom_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / a1, 0.0, 1.0)
        p2 = jnp.clip((step - a1) / a2, 0.0, 1.0)
        return jnp.where(step < a1,
                         annealing_cos(hi_m, lo_m, p1),
                         annealing_cos(lo_m, hi_m, p2))

    return lr_fn, mom_fn


def exponential_decay(initial_lr: float, total_step: int, decay_length: float,
                      decay_factor: float, staircase: bool = True) -> Callable:
    """Parity: learning_schedules_fastai.py:98-129."""
    decay_steps = max(int(decay_length * total_step), 1)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        stage = step / decay_steps
        if staircase:
            stage = jnp.floor(stage)
        return initial_lr * jnp.power(decay_factor, stage)

    return lr_fn


def manual_stepping(total_step: int, boundaries: Sequence[float],
                    rates: Sequence[float]) -> Callable:
    """Parity: learning_schedules_fastai.py:132-150."""
    assert len(boundaries) + 1 == len(rates)
    bounds = np.asarray([b * total_step for b in boundaries], np.float32)
    rates = np.asarray(rates, np.float32)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.sum(step >= bounds).astype(jnp.int32)
        return jnp.asarray(rates)[idx]

    return lr_fn


# ---------------------------------------------------------------------------
# mmcv-style LR policy zoo (reference torchie/trainer/hooks/lr_updater.py).
#
# The reference mutates optimizer.param_groups from a hook; here every policy
# is a pure ``step -> lr`` function so the whole schedule lives inside the
# jitted update (optax.inject_hyperparams) — no host round-trip per step.
# Epoch-based policies take steps_per_epoch and floor-divide, matching the
# reference's by_epoch=True progress counting.
# ---------------------------------------------------------------------------


def fixed_lr(base_lr: float) -> Callable:
    """Parity: lr_updater.py FixedLrUpdaterHook (:86-91)."""
    def lr_fn(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)
    return lr_fn


def step_lr(base_lr: float, step_points: Sequence[int] | int,
            gamma: float = 0.1, steps_per_epoch: int = 1) -> Callable:
    """lr = base * gamma^(#milestones passed). Milestones in epochs.
    Parity: lr_updater.py StepLrUpdaterHook (:94-120)."""
    def lr_fn(step):
        progress = jnp.asarray(step, jnp.float32) // steps_per_epoch
        if isinstance(step_points, int):
            exp = jnp.floor(progress / step_points)
        else:
            bounds = jnp.asarray(step_points, jnp.float32)
            exp = jnp.sum(progress >= bounds).astype(jnp.float32)
        return base_lr * jnp.power(gamma, exp)
    return lr_fn


def exp_lr(base_lr: float, gamma: float, steps_per_epoch: int = 1) -> Callable:
    """Parity: lr_updater.py ExpLrUpdaterHook (:123-130)."""
    def lr_fn(step):
        progress = jnp.asarray(step, jnp.float32) // steps_per_epoch
        return base_lr * jnp.power(gamma, progress)
    return lr_fn


def poly_lr(base_lr: float, total_step: int, power: float = 1.0,
            min_lr: float = 0.0) -> Callable:
    """Parity: lr_updater.py PolyLrUpdaterHook (:133-147)."""
    def lr_fn(step):
        pct = jnp.clip(jnp.asarray(step, jnp.float32) / total_step, 0.0, 1.0)
        return (base_lr - min_lr) * jnp.power(1.0 - pct, power) + min_lr
    return lr_fn


def inv_lr(base_lr: float, gamma: float, power: float = 1.0,
           steps_per_epoch: int = 1) -> Callable:
    """Parity: lr_updater.py InvLrUpdaterHook (:150-158)."""
    def lr_fn(step):
        progress = jnp.asarray(step, jnp.float32) // steps_per_epoch
        return base_lr * jnp.power(1.0 + gamma * progress, -power)
    return lr_fn


def cosine_lr(base_lr: float, total_step: int, target_lr: float = 0.0,
              ) -> Callable:
    """Parity: lr_updater.py CosineLrUpdaterHook (:161-175)."""
    def lr_fn(step):
        pct = jnp.clip(jnp.asarray(step, jnp.float32) / total_step, 0.0, 1.0)
        return target_lr + 0.5 * (base_lr - target_lr) * (
            1.0 + jnp.cos(jnp.pi * pct))
    return lr_fn


def with_warmup(lr_fn: Callable, warmup: str, warmup_iters: int,
                warmup_ratio: float = 0.1) -> Callable:
    """Wrap a policy with constant/linear/exp warmup over warmup_iters.
    Parity: lr_updater.py get_warmup_lr (:43-53)."""
    if warmup not in ("constant", "linear", "exp"):
        raise ValueError(f"unsupported warmup {warmup!r}")
    assert warmup_iters > 0 and 0 < warmup_ratio <= 1.0

    def warmed(step):
        step = jnp.asarray(step, jnp.float32)
        regular = lr_fn(step)
        pct = jnp.clip(step / warmup_iters, 0.0, 1.0)
        if warmup == "constant":
            k = jnp.full_like(pct, warmup_ratio)
        elif warmup == "linear":
            k = 1.0 - (1.0 - pct) * (1.0 - warmup_ratio)
        else:  # exp
            k = jnp.power(warmup_ratio, 1.0 - pct)
        return jnp.where(step < warmup_iters, regular * k, regular)

    return warmed


def build_lr_schedule(lr_config: dict, total_step: int,
                      steps_per_epoch: int = 1, base_lr: float = None):
    """Map reference lr_config dicts to (lr_fn, mom_fn|None).

    Accepts both the fastai-style ``type=`` schedules (det3d/builder.py:191-241)
    and the mmcv-style ``policy=`` zoo with warmup (hooks/lr_updater.py:10-175);
    the latter needs ``base_lr`` (the optimizer's lr in the reference).
    """
    kind = lr_config.get("type") or lr_config.get("policy")
    if kind == "one_cycle":
        return one_cycle(lr_config["lr_max"], total_step,
                         lr_config.get("moms", (0.95, 0.85)),
                         lr_config.get("div_factor", 10.0),
                         lr_config.get("pct_start", 0.4))
    if kind == "exponential_decay":
        return (exponential_decay(lr_config["initial_learning_rate"], total_step,
                                  lr_config["decay_length"],
                                  lr_config["decay_factor"],
                                  lr_config.get("staircase", True)), None)
    if kind == "manual_stepping":
        return (manual_stepping(total_step, lr_config["boundaries"],
                                lr_config["rates"]), None)

    # mmcv policy zoo
    spe = steps_per_epoch if lr_config.get("by_epoch", True) else 1
    if base_lr is None:
        base_lr = lr_config.get("base_lr")
    if base_lr is None:
        raise ValueError(f"policy {kind!r} needs base_lr")
    if kind in ("fixed", "Fixed"):
        fn = fixed_lr(base_lr)
    elif kind in ("step", "Step"):
        fn = step_lr(base_lr, lr_config["step"], lr_config.get("gamma", 0.1),
                     spe)
    elif kind in ("exp", "Exp"):
        fn = exp_lr(base_lr, lr_config["gamma"], spe)
    elif kind in ("poly", "Poly"):
        fn = poly_lr(base_lr, total_step, lr_config.get("power", 1.0),
                     lr_config.get("min_lr", 0.0))
    elif kind in ("inv", "Inv"):
        fn = inv_lr(base_lr, lr_config["gamma"], lr_config.get("power", 1.0),
                    spe)
    elif kind in ("cosine", "Cosine"):
        fn = cosine_lr(base_lr, total_step, lr_config.get("target_lr", 0.0))
    else:
        raise ValueError(f"unknown lr schedule {kind}")
    if lr_config.get("warmup") is not None:
        fn = with_warmup(fn, lr_config["warmup"], lr_config["warmup_iters"],
                         lr_config.get("warmup_ratio", 0.1))
    return fn, None
