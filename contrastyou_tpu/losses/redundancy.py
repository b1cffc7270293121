"""Barlow-Twins <-> IIC interpolating redundancy-reduction criterion.

Capability match for contrastyou/losses/redundancy_reduction.py:12-50
``RedundancyCriterion`` (after arXiv:2103.03230): target distribution
interpolates between identity/k (alpha=1, Barlow-Twins-like) and the joint
itself (alpha=0, entropy minimization); pseudo-CE to the target plus a
marginal-entropy constraint. ``alpha`` may be a traced scalar so the epoch
ramp never retraces.
"""
from __future__ import annotations

import jax.numpy as jnp

from .discrete_mi import compute_joint_2d_with_padding_zeros


def redundancy_criterion(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, *, alpha,
                         lamda: float = 1.0, eps: float = 1e-5,
                         symmetric: bool = True, return_joint: bool = False):
    """x_out/x_tf_out: [B, H, W, K] simplexes."""
    k = x_out.shape[-1]
    p_i_j = compute_joint_2d_with_padding_zeros(
        x_out, x_tf_out, symmetric=symmetric).reshape(k, k)
    eye = jnp.eye(k, dtype=p_i_j.dtype)
    target = (eye / k) * alpha + p_i_j * (1.0 - alpha)
    p_i = p_i_j.sum(axis=1, keepdims=True)
    p_j = p_i_j.sum(axis=0, keepdims=True)
    constrained = (-p_i_j * (-lamda * jnp.log(p_j + eps)
                             - lamda * jnp.log(p_i + eps))).sum()
    pseudo_loss = -(target * jnp.log(p_i_j + eps)).sum()
    loss = pseudo_loss + constrained
    if return_joint:
        return loss, p_i_j
    return loss


class RedundancyCriterion:
    def __init__(self, *, alpha: float, lamda: float = 1.0, eps: float = 1e-5,
                 symmetric: bool = True):
        self.alpha = alpha
        self._kw = dict(lamda=lamda, eps=eps, symmetric=symmetric)

    def set_ratio(self, alpha: float) -> None:
        """0: entropy minimization; 1: Barlow-Twins (ref: :46-50)."""
        assert 0 <= alpha <= 1, alpha
        self.alpha = alpha

    def __call__(self, x_out, x_tf_out, alpha=None):
        return redundancy_criterion(
            x_out, x_tf_out, alpha=self.alpha if alpha is None else alpha,
            **self._kw)
