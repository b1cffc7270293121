"""Naive pseudo-labeling (ref: semi_seg/hooks/pseudolabel.py:9-38):
MSE(prob, one_hot(argmax(prob))) on the aligned unlabeled prediction."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.hooks import StepContext, TrainerHook


class PseudoLabelTrainerHook(TrainerHook):
    def __init__(self, name: str = "pseudolabel", weight: float = 1.0):
        super().__init__(hook_name=name, weight=weight)

    def loss(self, ctx: StepContext, params, state):
        prob_tf = jax.nn.softmax(ctx.unlabeled_logits_tf, axis=-1)
        C = prob_tf.shape[-1]
        pseudo = jax.lax.stop_gradient(
            jax.nn.one_hot(jnp.argmax(prob_tf, axis=-1), C))
        loss = jnp.mean((prob_tf - pseudo) ** 2)
        return loss, state, {}
