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


def build_lr_schedule(lr_config: dict, total_step: int):
    """Map reference lr_config dicts to (lr_fn, mom_fn|None).
    Parity: det3d/builder.py:191-241."""
    kind = lr_config["type"]
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
    raise ValueError(f"unknown lr schedule {kind}")
