"""Prototype-orthogonality regularizer (ref: semi_seg/hooks/orthogonal.py:23-51):
push the pairwise cosine matrix of the final 1x1-conv class prototypes toward
identity. The prototypes are the model's ``Deconv_1x1`` kernel read from the
live params inside the step, so gradients reach them directly."""
from __future__ import annotations

import jax.numpy as jnp

from ..engine.hooks import StepContext, TrainerHook


class OrthogonalTrainerHook(TrainerHook):
    requires_unlabeled = False

    def __init__(self, *, hook_name: str = "orth", weight: float = 0.0,
                 prototype_layer: str = "Deconv_1x1"):
        super().__init__(hook_name=hook_name, weight=weight)
        self._layer = prototype_layer

    def loss(self, ctx: StepContext, params, state):
        kernel = ctx.params[self._layer]["kernel"]     # [1, 1, Cin, C]
        protos = kernel.reshape(-1, kernel.shape[-1]).T  # [C, Cin]
        protos = protos / jnp.maximum(
            jnp.linalg.norm(protos, axis=1, keepdims=True), 1e-12)
        gram = protos @ protos.T
        eye = jnp.eye(gram.shape[0], dtype=gram.dtype)
        loss = ((gram - eye) ** 2).mean()
        return loss, state, {}
