"""Output-space MI hooks (ref: semi_seg/hooks/midl.py:18-92): IIC spatial MI or
IMSAT applied directly on the prediction softmax of the two aligned views."""
from __future__ import annotations

import jax

from ..engine.hooks import StepContext, TrainerHook
from ..losses.discrete_mi import iid_segmentation_loss, imsat_loss


class IIDSegmentationTrainerHook(TrainerHook):
    def __init__(self, *, hook_name: str = "midl_hook", weight: float = 1.0,
                 mi_lambda: float = 1.0):
        super().__init__(hook_name=hook_name, weight=weight)
        self._mi_lambda = float(mi_lambda)

    def loss(self, ctx: StepContext, params, state):
        p_tf = jax.nn.softmax(ctx.unlabeled_tf_logits, axis=-1)
        p_aligned = jax.nn.softmax(ctx.unlabeled_logits_tf, axis=-1)
        mi = iid_segmentation_loss(p_tf, p_aligned, padding=0,
                                   lamda=self._mi_lambda)
        return mi, state, {"mi": mi}


class IMSATTrainHook(TrainerHook):
    def __init__(self, *, hook_name: str = "imsat", weight: float = 0.1):
        super().__init__(hook_name=hook_name, weight=weight)

    def loss(self, ctx: StepContext, params, state):
        p_tf = jax.nn.softmax(ctx.unlabeled_tf_logits, axis=-1)
        p_aligned = jax.nn.softmax(ctx.unlabeled_logits_tf, axis=-1)
        mi = 0.5 * (imsat_loss(p_tf) + imsat_loss(p_aligned))
        return mi, state, {"mi": mi}
