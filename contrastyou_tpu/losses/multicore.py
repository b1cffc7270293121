"""Multi-prototype ("multicore") losses: each true class owns several
prototype sub-classes; predictions over prototypes are collapsed back to true
classes before supervision.

Capability match for contrastyou/losses/multicore_loss.py:16-147:
- ``scale_grad``: gradient-scaling pass-through (jax.custom_vjp replaces the
  torch autograd.Function ``GradientReverse``);
- ``MultiCoreKL``: fixed prototype->class groups, ``reduced_simplex`` sums
  sub-class probabilities;
- ``AdaptiveOverSegmentedLoss`` / stricter variants learn a translate matrix —
  expressed functionally: the matrix is a hook-owned param, the loss takes it
  as an argument.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from .discrete_mi import iid_loss
from .kl import entropy_loss, kl_div


@jax.custom_vjp
def scale_grad(x, scale: float = 1.0):
    return x


def _scale_grad_fwd(x, scale):
    return x, scale


def _scale_grad_bwd(scale, g):
    return (g * scale, None)


scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


def reduced_simplex_from_groups(predict_simplex: jnp.ndarray,
                                groups: Sequence[Sequence[int]]) -> jnp.ndarray:
    """Sum prototype probabilities back to true classes along the last axis."""
    return jnp.stack([predict_simplex[..., list(g)].sum(axis=-1) for g in groups],
                     axis=-1)


def multicore_kl_loss(predict_simplex: jnp.ndarray, onehot_target: jnp.ndarray,
                      groups: Sequence[Sequence[int]]) -> jnp.ndarray:
    return kl_div(reduced_simplex_from_groups(predict_simplex, groups),
                  onehot_target)


class MultiCoreKL:
    """ref: multicore_loss.py:41-60."""

    def __init__(self, groups: List[List[int]]):
        self._groups = [list(g) for g in groups]

    @property
    def groups(self) -> List[List[int]]:
        return self._groups

    def reduced_simplex(self, predict_simplex: jnp.ndarray) -> jnp.ndarray:
        return reduced_simplex_from_groups(predict_simplex, self._groups)

    def __call__(self, predict_simplex, onehot_target):
        return multicore_kl_loss(predict_simplex, onehot_target, self._groups)


def adaptive_reduced_simplex(predict_simplex: jnp.ndarray,
                             translate_matrix: jnp.ndarray,
                             grad_scale: float = 1.0) -> jnp.ndarray:
    """[..., Cin] simplex @ softmax(translate [Cin, Cout]) (ref: :88-92)."""
    trans = jax.nn.softmax(translate_matrix, axis=1)
    return predict_simplex @ scale_grad(trans, grad_scale)


def adaptive_oversegmented_loss(predict_simplex: jnp.ndarray,
                                onehot_target: jnp.ndarray,
                                translate_matrix: jnp.ndarray, *,
                                entropy_decay: float = 1e-3) -> jnp.ndarray:
    """KL on the translated simplex + entropy regularizer on the translate
    matrix rows (ref: :66-92)."""
    reduced = adaptive_reduced_simplex(predict_simplex, translate_matrix)
    return (kl_div(reduced, onehot_target)
            + entropy_loss(jax.nn.softmax(translate_matrix, axis=1)) * entropy_decay)


def stricter_translate_matrix(free_matrix: jnp.ndarray, num_classes: int,
                              diag_scale: float = 30.0) -> jnp.ndarray:
    """[identity * 30 ; learned free rows] (ref: :95-126)."""
    eye = jnp.eye(num_classes, dtype=free_matrix.dtype) * diag_scale
    if free_matrix.shape[0] == 0:
        return eye
    return jnp.concatenate([eye, free_matrix], axis=0)


def stricter_adaptive_loss(predict_simplex: jnp.ndarray,
                           onehot_target: jnp.ndarray,
                           free_matrix: jnp.ndarray, *, num_classes: int,
                           mi_weight: float = 0.0) -> jnp.ndarray:
    """Stricter variant: diagonal prototypes pinned to their class; optional
    IIC regularizer on the translate matrix (ref: :129-147)."""
    trans = stricter_translate_matrix(free_matrix, num_classes)
    reduced = adaptive_reduced_simplex(predict_simplex, trans)
    loss = kl_div(reduced, onehot_target)
    if mi_weight and free_matrix.shape[0] > 0:
        soft = jax.nn.softmax(trans, axis=1)
        loss = loss + mi_weight * iid_loss(soft, soft)[0]
    return loss
