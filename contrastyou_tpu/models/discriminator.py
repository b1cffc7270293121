"""DCGAN-style discriminator for the adversarial semi-supervised baseline
(ref: contrastyou/arch/discriminator.py:17-44): 5 strided convs with
LeakyReLU + BatchNorm, sigmoid scalar output."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Discriminator(nn.Module):
    input_dim: int = 4  # typically num_classes probability maps
    ndf: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype)(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.mean(axis=(1, 2))  # global pool tolerates any input resolution
        x = nn.Dense(1, dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32)).squeeze(-1)
