"""MixUp regularization on labeled data (ref: semi_seg/hooks/mixup.py:15-78):
mix two labeled views + their one-hot targets with Beta(1,1) lambda, KL between
model(mixed) and mixed targets. The second labeled view is generated on-device
with a fresh GeoParams sample (the reference's MixupEpocher produced it with a
second dataset transform pass)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.hooks import StepContext, TrainerHook
from ..losses.kl import kl_div
from ..ops.affine import apply_geometric, sample_geo_params
from .utils import mixup_data


class MixUpTrainHook(TrainerHook):
    requires_unlabeled = False

    def __init__(self, *, hook_name: str = "mixup", weight: float = 1.0,
                 enable_bn: bool = True, mix_alpha: float = 1.0):
        super().__init__(hook_name=hook_name, weight=weight)
        self._enable_bn = bool(enable_bn)
        self._mix_alpha = float(mix_alpha)

    def loss(self, ctx: StepContext, params, state):
        k_geo, k_mix = jax.random.split(ctx.rng if ctx.rng is not None
                                        else jax.random.PRNGKey(0))
        image = ctx.labeled_image
        C = ctx.labeled_logits.shape[-1]
        onehot = jax.nn.one_hot(ctx.labeled_target, C)
        geo = sample_geo_params(k_geo, image.shape[0])
        image_tf = apply_geometric(image, geo, order=0)
        onehot_tf = apply_geometric(onehot, geo, order=0)

        mixed_x, mixed_y, _ = mixup_data(
            jnp.concatenate([image, image_tf], 0),
            jnp.concatenate([onehot, onehot_tf], 0), k_mix,
            alpha=self._mix_alpha)
        (logits, _), _ = ctx.bundle.apply_train(
            ctx.params, ctx.batch_stats, mixed_x,
            update_stats=False)  # extra-pass stats always discarded
        loss = kl_div(jax.nn.softmax(logits, -1), mixed_y)
        return loss, state, {}
