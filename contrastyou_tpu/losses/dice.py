"""Soft Dice losses (ref: contrastyou/losses/dice_loss.py:31-105), channels-last."""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def binary_dice_loss(predict: jnp.ndarray, target: jnp.ndarray, *,
                     smooth: float = 1.0, p: float = 2.0,
                     reduction: str = "mean") -> jnp.ndarray:
    """predict/target: [B, ...] soft masks for one class."""
    pred = predict.reshape(predict.shape[0], -1)
    targ = target.reshape(target.shape[0], -1)
    num = (pred * targ).sum(axis=1) + smooth
    den = (pred ** p + targ ** p).sum(axis=1) + smooth
    loss = 1.0 - num / den
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def dice_loss(predict: jnp.ndarray, target: jnp.ndarray, *,
              weight: Optional[Sequence[float]] = None,
              ignore_index: Optional[int] = None, smooth: float = 1.0,
              p: float = 2.0) -> jnp.ndarray:
    """predict/target: [B, ..., C] simplex / one-hot; mean over classes."""
    C = predict.shape[-1]
    total = 0.0
    for c in range(C):
        if c == ignore_index:
            continue
        part = binary_dice_loss(predict[..., c], target[..., c],
                                smooth=smooth, p=p)
        if weight is not None:
            part = part * weight[c]
        total = total + part
    return total / C


class BinaryDiceLoss:
    def __init__(self, smooth: float = 1.0, p: float = 2.0, reduction="mean"):
        self._kw = dict(smooth=smooth, p=p, reduction=reduction)

    def __call__(self, predict, target):
        return binary_dice_loss(predict, target, **self._kw)


class DiceLoss:
    def __init__(self, weight=None, ignore_index=None, **kwargs):
        self._kw = dict(weight=weight, ignore_index=ignore_index, **kwargs)

    def __call__(self, predict, target):
        return dice_loss(predict, target, **self._kw)
