"""Device-side intensity augmentations (capability match for the tensor-space
transforms in contrastyou/augment/tensor_augment.py: noise, cutout)."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gaussian_noise(images: jnp.ndarray, key: jax.Array, *, std: float = 0.05
                   ) -> jnp.ndarray:
    return images + std * jax.random.normal(key, images.shape, images.dtype)


def random_cutout(images: jnp.ndarray, key: jax.Array, *,
                  size: Tuple[int, int] = (32, 32)) -> jnp.ndarray:
    """Zero a random (size_h x size_w) box per sample."""
    B, H, W, _ = images.shape
    kh, kw = jax.random.split(key)
    ys = jax.random.randint(kh, (B,), 0, max(H - size[0], 1))
    xs = jax.random.randint(kw, (B,), 0, max(W - size[1], 1))
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    inside = ((yy >= ys[:, None, None]) & (yy < ys[:, None, None] + size[0])
              & (xx >= xs[:, None, None]) & (xx < xs[:, None, None] + size[1]))
    return images * (~inside)[..., None].astype(images.dtype)
