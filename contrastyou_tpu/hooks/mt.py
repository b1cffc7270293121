"""Mean-teacher family: MT, uncertainty-aware MT (UAMT), interpolation
consistency (ICT).

Capability match for semi_seg/hooks/mt.py:49-319 re-expressed functionally:
the teacher is hook STATE (an EMA'd params PyTree + its own BN stats) instead
of a deep-copied module; the EMA update (alpha-justified, weight-decayed,
optional BN-buffer EMA; ref EMAUpdater :49-82) runs in ``post_step`` inside the
same jitted step. Teacher forwards inside ``loss`` use stop_gradient'ed state.

BN semantics mapping (ref: _MeanTeacherEpocherHook.__init__ :154-166):
- update_bn=False (default): teacher normalizes with ITS own batch statistics
  (train-mode BN) and keeps updating its own running stats;
- update_bn=True: teacher BN runs in eval mode with running stats, and the
  running stats themselves are EMA'd from the student.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..engine.bundle import ModelBundle
from ..engine.hooks import StepContext, TrainerHook
from .utils import mixup_data


def ema_update(ema_tree, new_tree, alpha, weight_decay: float = 0.0):
    def _upd(e, n):
        out = e * alpha + (1.0 - alpha) * n
        if weight_decay > 0:
            out = out * (1.0 - weight_decay)
        return out
    return jax.tree.map(_upd, ema_tree, new_tree)


class MeanTeacherTrainerHook(TrainerHook):
    def __init__(self, *, name: str = "mt", weight: float = 1.0,
                 alpha: float = 0.999, weight_decay: float = 1e-5,
                 update_bn: bool = False, hard_clip: bool = False,
                 justify_alpha: bool = True):
        super().__init__(hook_name=name, weight=weight)
        self._alpha = float(alpha)
        self._weight_decay = float(weight_decay)
        self._update_bn = bool(update_bn)
        self._hard_clip = bool(hard_clip)
        self._justify_alpha = bool(justify_alpha)

    def init(self, rng, bundle: ModelBundle) -> Tuple[Any, Any]:
        state = {"teacher_params": jax.tree.map(jnp.array, bundle.params),
                 "teacher_batch_stats": jax.tree.map(jnp.array,
                                                     bundle.batch_stats),
                 "ema_step": jnp.int32(0)}
        return None, state

    # --- teacher forward -------------------------------------------------
    def _teacher_forward(self, ctx: StepContext, state, image):
        t_params = jax.lax.stop_gradient(state["teacher_params"])
        t_stats = jax.lax.stop_gradient(state["teacher_batch_stats"])
        if self._update_bn:
            logits, _ = ctx.bundle.apply_eval(t_params, t_stats, image)
            return logits, t_stats
        # NOTE round 3: fwd_only=True here (parity chain for the
        # stop-gradient teacher pass) MEASURED WORSE in the full mt step
        # (32.74 vs 31.70 ms/step on-chip, chained timing) — the raw
        # forward win does not survive in-step scheduling; keep the
        # interleaved plane path.
        (logits, _), new_stats = ctx.bundle.apply_train(t_params, t_stats,
                                                        image)
        return logits, new_stats

    def _teacher_target(self, ctx: StepContext, state):
        """-> (teacher prob aligned to the tf view, new_teacher_stats)."""
        logits, new_stats = self._teacher_forward(ctx, state,
                                                  ctx.unlabeled_image)
        prob_tf = jax.nn.softmax(ctx.affine_transformer(logits), axis=-1)
        if self._hard_clip:
            C = prob_tf.shape[-1]
            prob_tf = jax.nn.one_hot(jnp.argmax(prob_tf, -1), C)
        return jax.lax.stop_gradient(prob_tf), new_stats

    def loss(self, ctx: StepContext, params, state):
        student_prob = jax.nn.softmax(ctx.unlabeled_tf_logits, axis=-1)
        teacher_prob_tf, new_stats = self._teacher_target(ctx, state)
        loss = jnp.mean((teacher_prob_tf - student_prob) ** 2)
        new_state = dict(state, teacher_batch_stats=new_stats)
        return loss, new_state, {}

    def post_step(self, ctx: StepContext, new_model_params, state):
        step = state["ema_step"]
        alpha = (jnp.minimum(1.0 - 1.0 / (step + 1.0), self._alpha)
                 if self._justify_alpha else jnp.float32(self._alpha))
        new_teacher = ema_update(state["teacher_params"], new_model_params,
                                 alpha, self._weight_decay)
        new_state = dict(state, teacher_params=new_teacher,
                         ema_step=step + 1)
        if self._update_bn:
            new_state["teacher_batch_stats"] = ema_update(
                state["teacher_batch_stats"], ctx.batch_stats, alpha,
                self._weight_decay)
        return new_state

    def eval_params(self, state):
        """MTTrainer evaluates on the teacher (ref trainer.py:139-149)."""
        return state["teacher_params"]

    def eval_batch_stats(self, state):
        return state["teacher_batch_stats"]


class EMAEvalTrainerHook(TrainerHook):
    """Loss-free EMA of the STUDENT used only for evaluation/inference
    (config key ``EvalEMAParameters``) — a TPU-build extra on top of the
    reference's eval-on-teacher machinery (trainer.py:139-149): the same
    ``set_model4inference`` plumbing, but the tracked model costs nothing
    in the train step (no teacher forward, no consistency term).

    ``always_active``: runs even under trainers that deactivate regularizer
    hooks (FineTuneTrainer, ref trainer.py:199-204 activate_hooks=False) —
    the point is an EMA'd eval model for ft."""

    requires_unlabeled = False
    always_active = True

    def __init__(self, *, name: str = "ema_eval", alpha: float = 0.999,
                 weight_decay: float = 0.0, update_bn: bool = True,
                 justify_alpha: bool = True):
        super().__init__(hook_name=name, weight=0.0)
        self._alpha = float(alpha)
        self._weight_decay = float(weight_decay)
        self._update_bn = bool(update_bn)
        self._justify_alpha = bool(justify_alpha)

    def init(self, rng, bundle: ModelBundle) -> Tuple[Any, Any]:
        return None, {"ema_params": jax.tree.map(jnp.array, bundle.params),
                      "ema_batch_stats": jax.tree.map(jnp.array,
                                                      bundle.batch_stats),
                      "ema_step": jnp.int32(0)}

    def post_step(self, ctx: StepContext, new_model_params, state):
        step = state["ema_step"]
        alpha = (jnp.minimum(1.0 - 1.0 / (step + 1.0), self._alpha)
                 if self._justify_alpha else jnp.float32(self._alpha))
        new_state = dict(state, ema_step=step + 1,
                         ema_params=ema_update(state["ema_params"],
                                               new_model_params, alpha,
                                               self._weight_decay))
        if self._update_bn:
            new_state["ema_batch_stats"] = ema_update(
                state["ema_batch_stats"], ctx.batch_stats, alpha, 0.0)
        return new_state

    def eval_params(self, state):
        return state["ema_params"]

    def eval_batch_stats(self, state):
        return (state["ema_batch_stats"] if self._update_bn else None)


class UAMeanTeacherTrainerHook(MeanTeacherTrainerHook):
    """Uncertainty-aware MT (ref mt.py:209-276): teacher target averaged over
    one clean + N noisy passes; per-pixel loss masked where teacher entropy
    exceeds a threshold ramped with epoch."""

    def __init__(self, *, name: str = "uamt", weight: float = 1.0,
                 alpha: float = 0.999, weight_decay: float = 1e-5,
                 update_bn: bool = False, hard_clip: bool = False,
                 num_noise: int = 4, noise_std: float = 0.05,
                 max_epoch: int = 100):
        super().__init__(name=name, weight=weight, alpha=alpha,
                         weight_decay=weight_decay, update_bn=update_bn,
                         hard_clip=hard_clip)
        self._num_noise = int(num_noise)
        self._noise_std = float(noise_std)
        self._max_epoch = int(max_epoch)

    def loss(self, ctx: StepContext, params, state):
        image = ctx.unlabeled_image
        B = image.shape[0]
        N = self._num_noise
        C = ctx.unlabeled_tf_logits.shape[-1]
        # clean pass updates the teacher's own stats...
        clean_logits, new_stats = self._teacher_forward(ctx, state, image)
        # ...noisy passes normalize with batch stats but do not update
        # (ref: switch_bn_track(False) around the N passes)
        t_params = jax.lax.stop_gradient(state["teacher_params"])
        t_stats = jax.lax.stop_gradient(state["teacher_batch_stats"])

        # The N noisy passes run as ONE forward over the stacked [N*B]
        # batch with PER-PASS batch statistics (bn_groups=(B,)*N) — exactly
        # N independent forwards, but without jax.vmap over the model:
        # the Pallas plane stage is mesh-safe via custom_partitioning,
        # which has no vmap batching rule (round-3 fix: the vmapped form
        # raised NotImplementedError on TPU).
        noise = jax.random.normal(ctx.rng, (N, *image.shape), image.dtype)
        noisy_flat = (image[None] + self._noise_std * noise).reshape(
            N * B, *image.shape[1:])
        if getattr(getattr(ctx.bundle, "model", None),
                   "supports_bn_groups", False):
            (logits_flat, _), _ = ctx.bundle.apply_train(
                t_params, t_stats, noisy_flat, update_stats=False,
                bn_groups=(B,) * N)
        else:
            # Fallback for models without bn_groups: loop the N passes so
            # each normalizes with its OWN batch statistics over B (matching
            # the bn_groups path and the reference's independent forwards),
            # instead of pooling stats over all N*B noisy copies.
            per_pass = [
                ctx.bundle.apply_train(
                    t_params, t_stats, noisy_flat[i * B:(i + 1) * B],
                    update_stats=False)[0][0]
                for i in range(N)
            ]
            logits_flat = jnp.concatenate(per_pass, axis=0)
        noisy_logits = logits_flat.reshape(N, *clean_logits.shape)
        mean_logits = (clean_logits + noisy_logits.sum(0)) / (self._num_noise + 1)
        prob_tf = jax.nn.softmax(ctx.affine_transformer(mean_logits), axis=-1)
        entropy_tf = -(prob_tf * jnp.log(prob_tf + 1e-16)).sum(-1)
        if self._hard_clip:
            prob_tf = jax.nn.one_hot(jnp.argmax(prob_tf, -1), C)
        prob_tf = jax.lax.stop_gradient(prob_tf)

        student_prob = jax.nn.softmax(ctx.unlabeled_tf_logits, axis=-1)
        per_px = ((prob_tf - student_prob) ** 2).mean(-1)   # [B, H, W]
        ramp = ctx.epoch.astype(jnp.float32) / self._max_epoch
        threshold = (0.75 * math.log(C) + 0.25 * math.log(C) * ramp)
        mask = (entropy_tf < threshold).astype(jnp.float32)
        loss = (per_px * mask).mean() / (mask.mean() + 1e-2)
        new_state = dict(state, teacher_batch_stats=new_stats)
        return loss, new_state, {"mask": mask.mean()}


class ICTMeanTeacherTrainerHook(MeanTeacherTrainerHook):
    """Interpolation-consistency training (ref mt.py:279-319): mix the two
    unlabeled views and their teacher probabilities, match the STUDENT forward
    of the mixed image to the mixed teacher target."""

    def __init__(self, *, name: str = "ict", weight: float = 1.0,
                 alpha: float = 0.999, weight_decay: float = 1e-5,
                 update_bn: bool = False, mix_alpha: float = 0.2):
        super().__init__(name=name, weight=weight, alpha=alpha,
                         weight_decay=weight_decay, update_bn=update_bn)
        self._mix_alpha = float(mix_alpha)

    def loss(self, ctx: StepContext, params, state):
        t_logits_1, new_stats = self._teacher_forward(ctx, state,
                                                      ctx.unlabeled_image)
        t_logits_2, _ = self._teacher_forward(
            ctx, dict(state, teacher_batch_stats=new_stats),
            ctx.unlabeled_image_tf)
        t_prob = jax.nn.softmax(jnp.concatenate([t_logits_1, t_logits_2], 0),
                                axis=-1)
        images = jnp.concatenate([ctx.unlabeled_image, ctx.unlabeled_image_tf], 0)
        mixed_x, mixed_y, _ = mixup_data(images, t_prob, ctx.rng,
                                         alpha=self._mix_alpha)
        mixed_x = jax.lax.stop_gradient(mixed_x)
        mixed_y = jax.lax.stop_gradient(mixed_y)
        # student forward WITH gradient (BN stat updates from this extra pass
        # are discarded to keep the main-branch statistics canonical)
        (s_logits, _), _ = ctx.bundle.apply_train(
            ctx.params, ctx.batch_stats, mixed_x, update_stats=False)
        s_prob = jax.nn.softmax(s_logits, axis=-1)
        loss = jnp.mean((s_prob - mixed_y) ** 2)
        new_state = dict(state, teacher_batch_stats=new_stats)
        return loss, new_state, {}
