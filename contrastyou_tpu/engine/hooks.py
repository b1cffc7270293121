"""Hook protocol — the plugin system for semi-supervised regularizers.

Capability match for contrastyou/hooks/base.py:20-297, redesigned for XLA: the
reference dispatches Python callbacks per batch (before/after forward/
regularization); here every hook contributes pure functions that are COMPILED
INTO one jitted train step:

- ``init(rng, bundle)`` -> (learnable params, non-learnable state). Learnable
  params (projection heads, translate matrices) join the optimizer exactly like
  the reference adds hook params as an optimizer group (trainer/base.py:66-75).
- ``loss(ctx, params, state)`` -> (scalar loss, new_state, metrics dict). Runs
  inside value_and_grad; the engine sums ``weight * loss`` over hooks
  (the CombineEpochHook role, hooks/base.py:242-297).
- ``post_step(ctx, new_model_params, state)`` -> state. Runs after the
  optimizer update (EMA teacher updates — the after_batch_update callback).
- ``eval_params(state)`` -> replacement model params for evaluation, or None
  (eval-on-teacher, semi_seg/trainers/trainer.py:139-149).

``StepContext`` is the kwargs bundle of the reference hook contract
(semi_seg/epochers/epocher.py:320-333) in jit-able form: images, both
unlabeled logits variants, group/partition ids, the explicit geometric params
(replacing ``seed``) and an ``affine_transformer`` to align feature maps.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.affine import GeoParams, transform_logits
from .bundle import ModelBundle


@dataclass
class StepContext:
    # labeled branch
    labeled_image: Optional[jnp.ndarray] = None
    labeled_target: Optional[jnp.ndarray] = None          # int [B, H, W]
    labeled_logits: Optional[jnp.ndarray] = None
    labeled_taps: Dict[str, jnp.ndarray] = field(default_factory=dict)
    labeled_filenames: Any = None
    # unlabeled branch (two views)
    unlabeled_image: Optional[jnp.ndarray] = None
    unlabeled_image_tf: Optional[jnp.ndarray] = None
    unlabeled_logits: Optional[jnp.ndarray] = None        # f(x)
    unlabeled_tf_logits: Optional[jnp.ndarray] = None     # f(T(x))
    unlabeled_logits_tf: Optional[jnp.ndarray] = None     # T(f(x))
    unlabeled_taps: Dict[str, jnp.ndarray] = field(default_factory=dict)
    unlabeled_tf_taps: Dict[str, jnp.ndarray] = field(default_factory=dict)
    # grouping labels for contrastive objectives
    label_group: Optional[jnp.ndarray] = None             # scan ids [B]
    partition_group: Optional[jnp.ndarray] = None         # partition ids [B]
    patient_group: Optional[jnp.ndarray] = None           # patient ids [B]
    cycle_group: Optional[jnp.ndarray] = None             # cycle ids [B]
    superpixel: Optional[jnp.ndarray] = None
    # the explicit transform (replaces the reference's seed replay)
    geo_params: Optional[GeoParams] = None
    # misc
    rng: Optional[jax.Array] = None
    epoch: Optional[jnp.ndarray] = None                   # traced scalar
    params: Any = None                                    # current model params
    batch_stats: Any = None
    bundle: Optional[ModelBundle] = None                  # static closure data

    def affine_transformer(self, feature: jnp.ndarray, *, order: int = 0
                           ) -> jnp.ndarray:
        """Apply THE batch transform to a feature map (auto-resized params work
        at any resolution since coords are normalized)."""
        assert self.geo_params is not None
        return transform_logits(feature, self.geo_params, order=order)


class TrainerHook:
    """Base hook. Subclasses override the pieces they need."""

    #: static tap names this hook needs from the model forward
    taps: Tuple[str, ...] = ()
    #: whether this hook can work without an unlabeled branch
    requires_unlabeled: bool = True

    def __init__(self, *, hook_name: str, weight: float = 1.0):
        self.name = hook_name
        self.weight = float(weight)

    def init(self, rng: jax.Array, bundle: ModelBundle) -> Tuple[Any, Any]:
        """-> (learnable_params, state); either may be None/{}."""
        return None, None

    def loss(self, ctx: StepContext, params: Any, state: Any
             ) -> Tuple[jnp.ndarray, Any, Dict[str, jnp.ndarray]]:
        return jnp.float32(0.0), state, {}

    def post_step(self, ctx: StepContext, new_model_params: Any, state: Any) -> Any:
        return state

    def eval_params(self, state: Any) -> Optional[Any]:
        return None

    def eval_batch_stats(self, state: Any) -> Optional[Any]:
        """BN statistics to evaluate with when eval_params is overridden
        (teachers carry their own running stats)."""
        return None

    def on_epoch_start(self, state: Any, epoch: int) -> Any:
        """Host-side per-epoch state update (rarely needed — prefer in-graph
        schedules from ctx.epoch)."""
        return state

    def __repr__(self):
        return f"{self.__class__.__name__}(name={self.name}, weight={self.weight})"


def combined_taps(hooks: Sequence[TrainerHook]) -> Tuple[str, ...]:
    seen: list[str] = []
    for h in hooks:
        for t in h.taps:
            if t not in seen:
                seen.append(t)
    return tuple(seen)


def check_hook_names(hooks: Sequence[TrainerHook]) -> None:
    """Duplicate hook names are forbidden (ref: hooks/base.py:20-34)."""
    names = [h.name for h in hooks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate hook names: {names}")
