"""Optimizer + LR schedule factory.

Capability match for contrastyou/optim/ (torch_optimizer re-exports +
``GradualWarmupScheduler``, scheduler.py:19-134): RAdam default, warmup that
multiplies base lr up to ``multiplier`` over ``warmup_max`` epochs then cosine
anneal to eta_min — expressed as one optax per-step schedule so the jitted
step needs no host scheduler.step(). Gradient accumulation maps to
optax.MultiSteps (ref amp/amp.py:27-40 ``accumulate_iter``).
"""
from __future__ import annotations

from typing import Callable, Mapping, Optional, Tuple

import optax

_OPTIMIZERS = {
    "radam": optax.radam,
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
}


def warmup_cosine_schedule(*, base_lr: float, multiplier: float,
                           warmup_max_epoch: int, max_epoch: int,
                           steps_per_epoch: int,
                           eta_min: float = 1e-7) -> optax.Schedule:
    """lr ramps base_lr -> base_lr*multiplier over warmup_max epochs, then
    cosine anneals to eta_min over the remaining epochs."""
    peak = base_lr * multiplier
    warm_steps = max(warmup_max_epoch * steps_per_epoch, 1)
    rest = max((max_epoch - warmup_max_epoch) * steps_per_epoch, 1)
    return optax.join_schedules(
        [optax.linear_schedule(base_lr, peak, warm_steps),
         optax.cosine_decay_schedule(peak, rest, alpha=eta_min / max(peak, 1e-30))],
        boundaries=[warm_steps])


def create_optimizer(optim_params: Mapping, scheduler_params: Optional[Mapping],
                     *, max_epoch: int, steps_per_epoch: int,
                     accumulate_iter: int = 1,
                     param_labels=None,
                     ) -> Tuple[optax.GradientTransformation, Callable]:
    """Build (tx, schedule_fn) from reference-style config sections:
    Optim: {name, lr, weight_decay}; Scheduler: {multiplier, warmup_max}.

    param_labels: optional label PyTree (over the (params, hook_params) tuple)
    mapping leaves to "train"/"freeze" for pretrain-style freezing.
    """
    name = str(optim_params.get("name", "RAdam")).lower()
    lr = float(optim_params.get("lr", 1e-7))
    weight_decay = float(optim_params.get("weight_decay", 0.0))
    if scheduler_params:
        schedule = warmup_cosine_schedule(
            base_lr=lr,
            multiplier=float(scheduler_params.get("multiplier", 300)),
            warmup_max_epoch=int(scheduler_params.get("warmup_max", 10)),
            max_epoch=max_epoch, steps_per_epoch=steps_per_epoch)
    else:
        schedule = optax.constant_schedule(lr)

    if name not in _OPTIMIZERS:
        raise KeyError(f"optimizer '{name}' not in {tuple(_OPTIMIZERS)}")
    kwargs = {}
    if name in ("adamw",):
        kwargs["weight_decay"] = weight_decay
    tx = _OPTIMIZERS[name](learning_rate=schedule, **kwargs)
    if weight_decay and name not in ("adamw",):
        # coupled L2 (grad += wd * param before the adaptive update), matching
        # torch RAdam/Adam's default weight_decay semantics
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    if param_labels is not None:
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                   param_labels)
    if accumulate_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_iter)
    return tx, schedule
