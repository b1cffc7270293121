"""Tensor predicates and one-hot helpers (jnp).

Capability match for contrastyou/utils/general.py:68-170 (simplex/one_hot/
class2one_hot/probs2one_hot) reexpressed over NHWC jax arrays. The rebuild uses
channels-last layout throughout (TPU-native conv layout), so the class axis is
the LAST axis by default, not axis=1 as in the torch reference.
"""
from __future__ import annotations

import jax.numpy as jnp


def simplex(t: jnp.ndarray, axis: int = -1, atol: float = 1e-4) -> bool:
    """True if `t` sums to one along `axis` (a probability simplex)."""
    s = jnp.sum(t, axis=axis)
    return bool(jnp.allclose(s, jnp.ones_like(s), atol=atol))


def one_hot(t: jnp.ndarray, axis: int = -1, atol: float = 1e-4) -> bool:
    """True if `t` is a one-hot encoding along `axis`."""
    return simplex(t, axis, atol) and bool(jnp.all((t == 0) | (t == 1)))


def class2one_hot(seg: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Integer mask [..., H, W] -> one-hot [..., H, W, C] (channels-last)."""
    return jnp.eye(num_classes, dtype=jnp.float32)[seg]


def probs2class(probs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.argmax(probs, axis=axis)


def logits2class(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.argmax(logits, axis=axis)


def probs2one_hot(probs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    num_classes = probs.shape[axis]
    return class2one_hot(probs2class(probs, axis), num_classes)
