"""Shared hook utilities."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup_data(x: jnp.ndarray, y: jnp.ndarray, key: jax.Array,
               alpha: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-lambda mixup over the batch (ref: semi_seg/hooks/utils.py
    ``mixup_data``): lam ~ Beta(alpha, alpha), pair each sample with a random
    permutation. Returns (mixed_x, mixed_y, lam)."""
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha) if alpha > 0 else jnp.float32(1.0)
    perm = jax.random.permutation(k_perm, x.shape[0])
    mixed_x = lam * x + (1 - lam) * x[perm]
    mixed_y = lam * y + (1 - lam) * y[perm]
    return mixed_x, mixed_y, lam
