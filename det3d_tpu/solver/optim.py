"""Optimizer assembly (optax).

Parity with the reference's fastai OptimWrapper path (reference:
det3d/solver/fastai_optim.py:118-266 + det3d/builder.py:98-188): Adam with
betas (0.9, 0.99), decoupled ("true") weight decay 0.01 that skips BatchNorm
parameters, gradient-norm clipping at 35, and OneCycle-scheduled lr and
momentum (beta1). On TPU the whole update is a single fused optax chain under
jit; the momentum schedule rides optax.inject_hyperparams.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def _non_bn_mask(params) -> object:
    """True for params that should receive weight decay (everything except
    normalization scale/bias — fastai's bn_wd=False behavior)."""
    def is_bn_path(path) -> bool:
        keys = [getattr(k, "key", str(k)) for k in path]
        return any("BatchNorm" in str(k) or "norm" == str(k).lower() for k in keys)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: not is_bn_path(path), params)


def build_optimizer(optimizer_cfg: dict, lr_fn: Callable,
                    mom_fn: Optional[Callable] = None,
                    grad_clip_norm: Optional[float] = 35.0,
                    params=None) -> optax.GradientTransformation:
    """Build the optax chain from a reference-schema optimizer config
    (e.g. dict(TYPE="adam", VALUE=dict(amsgrad=0.0, wd=0.01), FIXED_WD=True)).
    """
    kind = str(optimizer_cfg.get("TYPE", optimizer_cfg.get("type", "adam"))).lower()
    value = optimizer_cfg.get("VALUE", optimizer_cfg.get("value", {}))
    wd = float(value.get("wd", 0.01))
    fixed_wd = bool(optimizer_cfg.get("FIXED_WD", True))

    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))

    if kind == "adam":
        if mom_fn is not None:
            def make_adam(learning_rate, b1):
                if fixed_wd:
                    return optax.adamw(learning_rate, b1=b1, b2=0.99,
                                       weight_decay=wd, mask=_non_bn_mask)
                return optax.adam(learning_rate, b1=b1, b2=0.99)
            opt = optax.inject_hyperparams(make_adam)(
                learning_rate=lr_fn, b1=mom_fn)
        else:
            if fixed_wd:
                opt = optax.adamw(lr_fn, b1=0.9, b2=0.99, weight_decay=wd,
                                  mask=_non_bn_mask)
            else:
                opt = optax.adam(lr_fn, b1=0.9, b2=0.99)
    elif kind in ("sgd", "momentum"):
        mom = float(value.get("momentum_optimizer_value", 0.9))
        opt = optax.sgd(lr_fn, momentum=mom)
    elif kind == "rms_prop":
        opt = optax.rmsprop(lr_fn, decay=float(value.get("decay", 0.9)),
                            momentum=float(value.get("momentum_optimizer_value", 0.0)),
                            eps=float(value.get("epsilon", 1e-8)))
    else:
        raise ValueError(f"unknown optimizer type {kind}")

    chain.append(opt)
    return optax.chain(*chain)
