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

import jax
import jax.numpy as jnp
import optax
from ..perf import get as perf_knob

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
    return warmup_schedule(base_lr=base_lr, multiplier=multiplier,
                           warmup_max_epoch=warmup_max_epoch,
                           max_epoch=max_epoch,
                           steps_per_epoch=steps_per_epoch, eta_min=eta_min)


def warmup_schedule(*, base_lr: float, multiplier: float,
                    warmup_max_epoch: int, max_epoch: int,
                    steps_per_epoch: int, eta_min: float = 1e-7,
                    name: str = "cosine", power: float = 0.9,
                    milestones=(), gamma: float = 0.1) -> optax.Schedule:
    """Reference warmup (GradualWarmupScheduler, scheduler.py:19-134:
    base_lr -> base_lr*multiplier over warmup_max epochs) into a named
    after-schedule over the remaining epochs:

    - ``cosine`` (the reference's only after_scheduler): anneal to eta_min;
    - ``poly``: peak * (1 - t/T)^power, the segmentation-standard decay
      (TPU-build extra);
    - ``step``: multiply by ``gamma`` at each epoch in ``milestones``
      (torch MultiStepLR semantics, epochs counted from training start).
    """
    peak = base_lr * multiplier
    warm_steps = max(warmup_max_epoch * steps_per_epoch, 1)
    rest = max((max_epoch - warmup_max_epoch) * steps_per_epoch, 1)
    if name == "cosine":
        after = optax.cosine_decay_schedule(
            peak, rest, alpha=eta_min / max(peak, 1e-30))
    elif name == "poly":
        after = optax.polynomial_schedule(
            init_value=peak, end_value=eta_min, power=power,
            transition_steps=rest)
    elif name == "step":
        # Milestones are epochs from training start (torch MultiStepLR).
        # Accumulate gammas per boundary so milestones that clamp to the
        # same post-warmup step (e.g. several at/before warmup_max_epoch)
        # each still contribute one decay instead of dict-collapsing; a
        # clamped boundary of 0 fires at the warmup join as intended.
        bounds: dict = {}
        for m in milestones:
            k = max((int(m) - warmup_max_epoch), 0) * steps_per_epoch
            bounds[k] = bounds.get(k, 1.0) * gamma
        after = optax.piecewise_constant_schedule(peak, bounds)
    else:
        raise KeyError(f"scheduler '{name}' not in (cosine, poly, step)")
    return optax.join_schedules(
        [optax.linear_schedule(base_lr, peak, warm_steps), after],
        boundaries=[warm_steps])


def _fused_opt_enabled() -> bool:
    import os
    return perf_knob("FUSED_OPT") != "0"


def _pack_groups(leaves, threshold: int):
    """Static packing plan: indices of small floating leaves grouped by
    dtype (deterministic given the tree, so init/update always agree)."""
    small = [i for i, l in enumerate(leaves)
             if l.size <= threshold and jnp.issubdtype(l.dtype, jnp.floating)]
    groups: dict = {}
    for i in small:
        groups.setdefault(str(leaves[i].dtype), []).append(i)
    return tuple((dt, tuple(idx)) for dt, idx in sorted(groups.items()))


def _pack(tree, threshold: int):
    leaves, _ = jax.tree.flatten(tree)
    groups = _pack_groups(leaves, threshold)
    small_set = {i for _, idx in groups for i in idx}
    fused = tuple(jnp.concatenate([leaves[i].ravel() for i in idx])
                  for _, idx in groups)
    rest = tuple(l for i, l in enumerate(leaves) if i not in small_set)
    return fused, rest


def _unpack(packed, like_tree, threshold: int):
    fused, rest = packed
    leaves, treedef = jax.tree.flatten(like_tree)
    groups = _pack_groups(leaves, threshold)
    out: list = [None] * len(leaves)
    for gi, (_, idx) in enumerate(groups):
        off = 0
        for i in idx:
            n = leaves[i].size
            out[i] = fused[gi][off:off + n].reshape(leaves[i].shape)
            off += n
    rest_it = iter(rest)
    for i in range(len(out)):
        if out[i] is None:
            out[i] = next(rest_it)
    return jax.tree.unflatten(treedef, out)


def fuse_small_leaves(tx: optax.GradientTransformation,
                      threshold: int = 8192) -> optax.GradientTransformation:
    """Run ``tx`` on a packed tree where every leaf with <= ``threshold``
    elements is raveled into one per-dtype vector.

    EXACT for elementwise transforms (adam/radam/sgd/add_decayed_weights
    with a global schedule — everything create_optimizer builds): packing
    only changes how elements are grouped into XLA ops, not the per-element
    math (bit-identical; tests/test_fused_opt.py). Why: the round-3 step
    trace showed ~2 ms/step of [32]/[64]-sized update fusions + their
    copy-dones — one fixed-latency op cluster per BN scale/bias leaf (~47
    per step). Packed, the whole small-leaf population updates in a couple
    of fused vector ops. NOT valid around per-leaf-labelled transforms
    (optax.multi_transform) — create_optimizer skips it when freezing
    labels are in play."""

    def init(params):
        return tx.init(_pack(params, threshold))

    def update(updates, state, params=None):
        pu = _pack(updates, threshold)
        pp = _pack(params, threshold) if params is not None else None
        new_u, new_state = tx.update(pu, state, pp)
        return _unpack(new_u, updates, threshold), new_state

    return optax.GradientTransformation(init, update)


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
        schedule = warmup_schedule(
            base_lr=lr,
            multiplier=float(scheduler_params.get("multiplier", 300)),
            warmup_max_epoch=int(scheduler_params.get("warmup_max", 10)),
            max_epoch=max_epoch, steps_per_epoch=steps_per_epoch,
            name=str(scheduler_params.get("name", "cosine")).lower(),
            power=float(scheduler_params.get("power", 0.9)),
            milestones=tuple(scheduler_params.get("milestones", ())),
            gamma=float(scheduler_params.get("gamma", 0.1)))
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
    elif _fused_opt_enabled():
        tx = fuse_small_leaves(tx)
    if accumulate_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_iter)
    return tx, schedule
