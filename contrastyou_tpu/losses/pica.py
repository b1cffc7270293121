"""PICA partition-uncertainty losses (ref: contrastyou/losses/pica_loss.py:10-82)."""
from __future__ import annotations

import math

import jax.numpy as jnp
import optax

from .discrete_mi import compute_joint_2d


def _l2norm(x, axis):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def pui_loss(x: jnp.ndarray, y: jnp.ndarray, lamda: float = 2.0) -> jnp.ndarray:
    """Partition Uncertainty Index over [N, K] assignment simplexes."""
    pui = _l2norm(x.T, axis=1) @ _l2norm(y, axis=0)
    k = pui.shape[0]
    labels = jnp.arange(k)
    loss_ce = optax.softmax_cross_entropy_with_integer_labels(pui, labels).mean()
    p = x.mean(axis=0)
    loss_ne = math.log(p.shape[0]) + (p * jnp.log(p)).sum()
    return loss_ce + lamda * loss_ne


def pui_seg_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, lamda: float = 2.0,
                 padding: int = 3) -> jnp.ndarray:
    """Segmentation PUI over [B, H, W, K] simplexes: displacement joint,
    diagonal log-likelihood + balance regularizer."""
    joint = compute_joint_2d(x_out, x_tf_out, symmetric=True, padding=padding)
    p_i_j = joint.mean(axis=(0, 1))
    k = p_i_j.shape[0]
    eye = jnp.eye(k, dtype=p_i_j.dtype)
    loss_ce = (-eye * jnp.log(p_i_j + 1e-16)).mean()
    p = x_out.reshape(-1, k).mean(axis=0)
    loss_ne = math.log(k) + (p * jnp.log(p + 1e-16)).sum()
    return loss_ce + lamda * loss_ne
