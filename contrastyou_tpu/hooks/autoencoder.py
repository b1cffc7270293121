"""Denoising-autoencoder auxiliary hook (ref: semi_seg/hooks/autoencoder.py:
30-60): a learnable 1x1 conv + sigmoid reconstructs the input image from the
unlabeled prediction logits; MSE reconstruction loss. The aux layer's params
are hook params and therefore join the optimizer."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..engine.bundle import ModelBundle
from ..engine.hooks import StepContext, TrainerHook


class _AuxLayer(nn.Module):
    out_features: int = 1
    activation: str = "sigmoid"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_features, (1, 1))(x)
        return nn.sigmoid(x) if self.activation == "sigmoid" else nn.tanh(x)


class DenoisingAutoEncoderTrainerHook(TrainerHook):
    def __init__(self, *, hook_name: str = "dae", weight: float = 0.0,
                 num_classes: int = 4):
        super().__init__(hook_name=hook_name, weight=weight)
        self._num_classes = int(num_classes)
        self._layer = _AuxLayer()

    def init(self, rng, bundle: ModelBundle):
        h = w = 8
        dummy = jnp.zeros((1, h, w, self._num_classes))
        params = self._layer.init(rng, dummy)["params"]
        return params, None

    def loss(self, ctx: StepContext, params, state):
        recovered = self._layer.apply({"params": params},
                                      ctx.unlabeled_tf_logits)
        loss = jnp.mean((recovered - ctx.unlabeled_image_tf) ** 2)
        return loss, state, {}
