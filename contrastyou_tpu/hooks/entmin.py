"""Entropy minimization on the aligned unlabeled prediction
(ref: semi_seg/hooks/entmin.py:7-32)."""
from __future__ import annotations

import jax

from ..engine.hooks import StepContext, TrainerHook
from ..losses.kl import entropy_loss


class EntropyMinTrainerHook(TrainerHook):
    def __init__(self, name: str = "entmin", weight: float = 1.0):
        super().__init__(hook_name=name, weight=weight)

    def loss(self, ctx: StepContext, params, state):
        prob_tf = jax.nn.softmax(ctx.unlabeled_logits_tf, axis=-1)
        return entropy_loss(prob_tf), state, {}
