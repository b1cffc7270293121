"""Local windowed normalized cross-correlation (VoxelMorph-style NCC).

Capability match for contrastyou/losses/cross_correlation.py:10-60 ``CCLoss``:
window sums of I, J, I^2, J^2, IJ -> local means/variances -> squared NCC,
loss = -mean(cc). Inputs are channels-last [B, H, W, 1] edge maps.

TPU-native: the five ones-kernel convolutions collapse into ONE sum-pooling
pass over a stacked [B*5, H, W, 1] tensor via lax.reduce_window — pure VPU
work that XLA fuses with the surrounding elementwise ops; padding replicates
the torch conv padding = floor(win/2) arithmetic exactly (incl. even windows).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def _window_sum(x: jnp.ndarray, win: Tuple[int, int]) -> jnp.ndarray:
    """Sliding-window sum over H, W of an NHWC tensor with same-size output
    (odd windows; equals a torch conv2d with an all-ones kernel and
    padding=win//2)."""
    assert win[0] % 2 == 1 and win[1] % 2 == 1, f"window must be odd, got {win}"
    ph, pw = win[0] // 2, win[1] // 2
    pad = [(0, 0), (ph, ph), (pw, pw), (0, 0)]
    return lax.reduce_window(x, 0.0, lax.add, (1, win[0], win[1], 1),
                             (1, 1, 1, 1), pad)


def windowed_ncc_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray, *,
                      win: Tuple[int, int] = (9, 9), eps: float = 1e-5
                      ) -> jnp.ndarray:
    """-mean(local NCC^2) between two NHWC single-channel maps."""
    I, J = y_true, y_pred
    win_size = win[0] * win[1]
    stacked = jnp.concatenate([I, J, I * I, J * J, I * J], axis=0)
    sums = _window_sum(stacked, win)
    I_sum, J_sum, I2_sum, J2_sum, IJ_sum = jnp.split(sums, 5, axis=0)

    u_I = I_sum / win_size
    u_J = J_sum / win_size
    cross = IJ_sum - u_J * I_sum - u_I * J_sum + u_I * u_J * win_size
    cross = jnp.maximum(cross, eps)
    I_var = jnp.maximum(I2_sum - 2 * u_I * I_sum + u_I * u_I * win_size, eps)
    J_var = jnp.maximum(J2_sum - 2 * u_J * J_sum + u_J * u_J * win_size, eps)
    cc = (cross * cross) / (I_var * J_var)
    return -cc.mean()


class CCLoss:
    def __init__(self, win: Tuple[int, int] = (9, 9), *, eps: float = 1e-5):
        self._win = tuple(win)
        self._eps = eps

    def __call__(self, y_true, y_pred):
        return windowed_ncc_loss(y_true, y_pred, win=self._win, eps=self._eps)
