"""Device-side intensity augmentations (capability match for the tensor-space
transforms in contrastyou/augment/tensor_augment.py: noise, cutout)."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gaussian_noise(images: jnp.ndarray, key: jax.Array, *, std: float = 0.05
                   ) -> jnp.ndarray:
    return images + std * jax.random.normal(key, images.shape, images.dtype)


def color_jitter(images: jnp.ndarray, key: jax.Array, *,
                 brightness: float = 0.2, contrast: float = 0.2) -> jnp.ndarray:
    """Per-sample brightness/contrast jitter on [0,1] grayscale images (the
    on-device form of the ACDC ColorJitter, semi_seg/augment.py ACDCTransforms2)."""
    B = images.shape[0]
    kb, kc = jax.random.split(key)
    b = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness,
                           maxval=1 + brightness)
    c = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast,
                           maxval=1 + contrast)
    mean = images.mean(axis=(1, 2, 3), keepdims=True)
    out = (images - mean) * c + mean * b
    return jnp.clip(out, 0.0, 1.0)


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
