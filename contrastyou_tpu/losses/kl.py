"""Entropy / KL / JSD family (ref: contrastyou/losses/kl.py:30-174).

All functions take channels-LAST probability tensors (class axis = -1) and are
pure jnp — safe inside jit and grad. ``kl_div(prob, target)`` with a one-hot
target equals cross-entropy; it is the supervised criterion of the whole
framework (ref: main.py:75 ``criterion=KL_div()``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return x.mean()
    if reduction == "sum":
        return x.sum()
    if reduction == "none":
        return x
    raise ValueError(f"reduction must be mean|sum|none, got {reduction}")


def entropy_loss(probs: jnp.ndarray, *, axis: int = -1, eps: float = 1e-16,
                 reduction: str = "mean") -> jnp.ndarray:
    """H(p) = -sum p log p along `axis` (ref: kl.py:30 ``Entropy``)."""
    e = -(probs * jnp.log(probs + eps)).sum(axis=axis)
    return _reduce(e, reduction)


def kl_div(prob: jnp.ndarray, target: jnp.ndarray, *, axis: int = -1,
           eps: float = 1e-16, weight: Optional[Sequence[float]] = None,
           reduction: str = "mean") -> jnp.ndarray:
    """KL(target || prob) = -sum target * log(prob/target)
    (ref: kl.py:81-140 ``KL_div``; class weights normalized to mean 1)."""
    kl = -target * jnp.log((prob + eps) / (target + eps))
    if weight is not None:
        w = jnp.asarray(weight, dtype=kl.dtype)
        w = w / w.sum() * w.shape[0]
        shape = [1] * kl.ndim
        shape[axis] = w.shape[0]
        kl = kl * w.reshape(shape)
    return _reduce(kl.sum(axis=axis), reduction)


def jsd_div(*probs: jnp.ndarray, eps: float = 1e-16, axis: int = -1,
            reduction: str = "mean") -> jnp.ndarray:
    """JSD = H(mean p_i) - mean H(p_i) (ref: kl.py:142-174)."""
    mean_prob = sum(probs) / len(probs)
    f_term = entropy_loss(mean_prob, axis=axis, eps=eps, reduction=reduction)
    mean_entropy = sum(entropy_loss(p, axis=axis, eps=eps, reduction=reduction)
                       for p in probs) / len(probs)
    return f_term - mean_entropy


class Entropy:
    def __init__(self, reduction: str = "mean", eps: float = 1e-16):
        self._reduction, self._eps = reduction, eps

    def __call__(self, probs: jnp.ndarray) -> jnp.ndarray:
        return entropy_loss(probs, eps=self._eps, reduction=self._reduction)


def entropy_prior(probs: jnp.ndarray, prior: Optional[jnp.ndarray] = None,
                  *, eps: float = 1e-16) -> jnp.ndarray:
    """log(C) - KL with prob=prior, target=probs — i.e. the reference's
    ``KL_div()(prior, input_)`` call order (ref: kl.py:63-79 ``EntropyPrior``:
    -sum probs * log((prior+eps)/(probs+eps)), mean-reduced)."""
    import math
    C = probs.shape[-1]
    if prior is None:
        prior = jnp.full((C,), 1.0 / C, dtype=probs.dtype)
    prior = jnp.broadcast_to(prior, probs.shape)
    return math.log(C) - kl_div(prior, probs, eps=eps)


class KLDiv:
    def __init__(self, reduction: str = "mean", eps: float = 1e-16,
                 weight: Optional[Sequence[float]] = None):
        self._reduction, self._eps, self._weight = reduction, eps, weight

    def __call__(self, prob: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return kl_div(prob, target, eps=self._eps, weight=self._weight,
                      reduction=self._reduction)


class JSDiv:
    def __init__(self, reduction: str = "mean", eps: float = 1e-16):
        self._reduction, self._eps = reduction, eps

    def __call__(self, *probs: jnp.ndarray) -> jnp.ndarray:
        return jsd_div(*probs, eps=self._eps, reduction=self._reduction)
