"""Consistency regularizer (ref: semi_seg/hooks/consistency.py:10-38):
MSE between softmax(f(T(x))) and stop_grad(softmax(T(f(x))))."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.hooks import StepContext, TrainerHook


class ConsistencyTrainerHook(TrainerHook):
    def __init__(self, name: str = "consistency", weight: float = 1.0):
        super().__init__(hook_name=name, weight=weight)

    def loss(self, ctx: StepContext, params, state):
        prob_tf = jax.nn.softmax(ctx.unlabeled_logits_tf, axis=-1)   # T(f(x))
        tf_prob = jax.nn.softmax(ctx.unlabeled_tf_logits, axis=-1)   # f(T(x))
        loss = jnp.mean((jax.lax.stop_gradient(prob_tf) - tf_prob) ** 2)
        return loss, state, {}
