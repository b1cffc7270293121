"""Differentiable mean teacher (DMT): the teacher is additionally OPTIMIZED on
a labeled meta-objective, in four update-rule variants plus plain MT.

Capability match for semi_seg/hooks/dmt.py:23-423. The reference implements
the teacher-gradient plumbing with manual parameter surgery (state_dict
checkpoints, grad copying, context managers); in JAX each rule is a direct
``jax.grad`` over the teacher params plus an optax Adam step carried in hook
state:
- ``mt``:      plain EMA teacher (baseline rule);
- ``method1``: consistency vs teacher_t; teacher <- Adam(teacher_t,
               grad_meta(EMA(teacher_t, student_{t+1})));
- ``method2``: teacher perturbed by -meta_weight * grad_meta(teacher) BEFORE
               producing the consistency target; post-step EMA;
- ``method3``: teacher <- Adam(EMA(teacher, student), grad_meta(EMA(...)));
- ``method4``: meta Adam step first (teacher at t+1 produces the target),
               persistent teacher stays at t then EMAs.
- ``second_order``: the DMTEpcoher meta-update to the STUDENT
  (semi_seg/epochers/epocher.py:466-487): differentiate the labeled meta loss
  of the one-virtual-step-EMA'd teacher BACK through the student's own
  update. The reference builds this with ``create_graph=True`` autograd and
  parameter surgery (and then visibly drops the meta grad); here it is one
  nested ``jax.grad`` inside the step's outer grad — the student's gradient
  includes the second-order term by construction.
The meta criterion is KL (=CE) or soft dice on the labeled batch
(ref dmt.py:55 ``meta_criterion in {ce, dice}``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..engine.bundle import ModelBundle
from ..engine.hooks import StepContext, TrainerHook
from ..losses.dice import dice_loss
from ..losses.kl import kl_div
from .mt import ema_update

_METHODS = ("mt", "method1", "method2", "method3", "method4", "second_order")


class DifferentiableMeanTeacherTrainerHook(TrainerHook):
    def __init__(self, *, name: str = "dmt", weight: float = 1.0,
                 alpha: float = 0.999, weight_decay: float = 1e-5,
                 meta_weight: float = 1e-3, meta_criterion: str = "ce",
                 method_name: str = "method1"):
        super().__init__(hook_name=name, weight=weight)
        assert method_name in _METHODS, method_name
        assert meta_criterion in ("ce", "dice"), meta_criterion
        self._alpha = float(alpha)
        self._weight_decay = float(weight_decay)
        self._meta_weight = float(meta_weight)
        self._meta_criterion = meta_criterion
        self._method = method_name
        self._teacher_tx = optax.chain(optax.add_decayed_weights(1e-5),
                                       optax.adam(self._meta_weight))

    def init(self, rng, bundle: ModelBundle) -> Tuple[Any, Any]:
        teacher_params = jax.tree.map(jnp.array, bundle.params)
        state: Dict[str, Any] = {
            "teacher_params": teacher_params,
            "teacher_batch_stats": jax.tree.map(jnp.array, bundle.batch_stats),
            "ema_step": jnp.int32(0),
        }
        if self._method in ("method1", "method3", "method4"):
            state["teacher_opt"] = self._teacher_tx.init(teacher_params)
        return None, state

    # --- pieces ---------------------------------------------------------
    def _meta_loss_fn(self, ctx: StepContext, t_params, t_stats, *,
                      train: bool):
        """Labeled meta loss at the given teacher params."""
        if train:
            (logits, _), _ = ctx.bundle.apply_train(t_params, t_stats,
                                                    ctx.labeled_image,
                                                    update_stats=False)
        else:
            logits, _ = ctx.bundle.apply_eval(t_params, t_stats,
                                              ctx.labeled_image)
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(ctx.labeled_target, probs.shape[-1])
        if self._meta_criterion == "ce":
            return kl_div(probs, onehot)
        return dice_loss(probs, onehot, ignore_index=0)

    def _consistency(self, ctx: StepContext, t_params, t_stats):
        """-> (loss, new_teacher_stats): MSE(teacher target, student prob)."""
        t_params = jax.lax.stop_gradient(t_params)
        (t_logits, _), new_stats = ctx.bundle.apply_train(
            t_params, jax.lax.stop_gradient(t_stats), ctx.unlabeled_image)
        target = jax.nn.softmax(ctx.affine_transformer(t_logits), axis=-1)
        target = jax.lax.stop_gradient(target)
        student = jax.nn.softmax(ctx.unlabeled_tf_logits, axis=-1)
        return jnp.mean((target - student) ** 2), new_stats

    def _meta_grad(self, ctx, t_params, t_stats, *, train: bool):
        loss, grads = jax.value_and_grad(
            lambda p: self._meta_loss_fn(ctx, p, t_stats, train=train))(t_params)
        return loss, jax.lax.stop_gradient(grads)

    # --- hook protocol --------------------------------------------------
    def loss(self, ctx: StepContext, params, state):
        metrics = {}
        new_state = dict(state)
        if self._method == "method2":
            meta_loss, g = self._meta_grad(ctx, state["teacher_params"],
                                           state["teacher_batch_stats"],
                                           train=False)
            perturbed = jax.tree.map(lambda p, gr: p - self._meta_weight * gr,
                                     state["teacher_params"], g)
            cons, new_stats = self._consistency(ctx, perturbed,
                                                state["teacher_batch_stats"])
            metrics["teacher_loss"] = meta_loss
        elif self._method == "method4":
            # teacher fwd updates stats at t, then a meta Adam step produces
            # the t+1 teacher used ONLY for this batch's target
            _, stats_t = ctx.bundle.apply_train(
                jax.lax.stop_gradient(state["teacher_params"]),
                jax.lax.stop_gradient(state["teacher_batch_stats"]),
                ctx.unlabeled_image)
            meta_loss, g = self._meta_grad(ctx, state["teacher_params"],
                                           stats_t, train=False)
            updates, opt_state = self._teacher_tx.update(
                g, state["teacher_opt"], state["teacher_params"])
            t1 = optax.apply_updates(state["teacher_params"], updates)
            cons, new_stats = self._consistency(ctx, t1, stats_t)
            new_state["teacher_opt"] = opt_state
            metrics["teacher_loss"] = meta_loss
        elif self._method == "second_order":
            cons, new_stats = self._consistency(ctx, state["teacher_params"],
                                                state["teacher_batch_stats"])
            meta_loss = self._second_order_meta(ctx, state, cons)
            metrics["meta_loss"] = meta_loss
            new_state["teacher_batch_stats"] = new_stats
            metrics["consistency_loss"] = cons
            return cons + meta_loss, new_state, metrics
        else:
            cons, new_stats = self._consistency(ctx, state["teacher_params"],
                                                state["teacher_batch_stats"])
        new_state["teacher_batch_stats"] = new_stats
        metrics["consistency_loss"] = cons
        return cons, new_state, metrics

    def _second_order_meta(self, ctx: StepContext, state, cons):
        """Meta loss of the virtually-updated teacher, differentiable back to
        the student (ref epocher.py:466-487):
        s1 = student - meta_weight * d(sup + 0.1 cons)/d(student)   [inner grad]
        t1 = 0.999 teacher + 0.001 s1
        meta = sup_criterion(t1(labeled))
        The inner ``jax.grad`` is itself differentiated by the step's outer
        grad — the create_graph=True semantics, with no parameter surgery."""
        onehot = jax.nn.one_hot(ctx.labeled_target,
                                ctx.labeled_logits.shape[-1])
        # the teacher target for the inner consistency term (constant wrt p)
        (t_logits, _), _ = ctx.bundle.apply_train(
            jax.lax.stop_gradient(state["teacher_params"]),
            jax.lax.stop_gradient(state["teacher_batch_stats"]),
            ctx.unlabeled_image, update_stats=False)
        t_target = jax.lax.stop_gradient(
            jax.nn.softmax(ctx.affine_transformer(t_logits), axis=-1))
        stats = jax.lax.stop_gradient(ctx.batch_stats)

        def inner_loss(p):
            (l_logits, _), _ = ctx.bundle.apply_train(
                p, stats, ctx.labeled_image, update_stats=False)
            sup = kl_div(jax.nn.softmax(l_logits, axis=-1), onehot)
            (u_logits, _), _ = ctx.bundle.apply_train(
                p, stats, ctx.unlabeled_image_tf, update_stats=False)
            student = jax.nn.softmax(u_logits, axis=-1)
            return sup + 0.1 * jnp.mean((t_target - student) ** 2)

        first_deriv = jax.grad(inner_loss)(ctx.params)  # differentiable
        s1 = jax.tree.map(lambda v, g: v - self._meta_weight * g,
                          ctx.params, first_deriv)
        t1 = jax.tree.map(
            lambda vt, vs: self._alpha * jax.lax.stop_gradient(vt)
            + (1.0 - self._alpha) * vs,
            state["teacher_params"], s1)
        return self._meta_loss_fn(
            ctx, t1, jax.lax.stop_gradient(state["teacher_batch_stats"]),
            train=True)

    def post_step(self, ctx: StepContext, new_model_params, state):
        new_state = dict(state)
        alpha = jnp.minimum(1.0 - 1.0 / (state["ema_step"] + 1.0), self._alpha)
        ema_params = ema_update(state["teacher_params"], new_model_params,
                                alpha, self._weight_decay)
        if self._method in ("mt", "method2", "method4", "second_order"):
            new_state["teacher_params"] = ema_params
        elif self._method == "method1":
            # grad at the EMA'd (t+1) teacher, Adam step applied at teacher_t
            _, g = self._meta_grad(ctx, ema_params,
                                   state["teacher_batch_stats"], train=True)
            updates, opt_state = self._teacher_tx.update(
                g, state["teacher_opt"], state["teacher_params"])
            new_state["teacher_params"] = optax.apply_updates(
                state["teacher_params"], updates)
            new_state["teacher_opt"] = opt_state
        elif self._method == "method3":
            _, g = self._meta_grad(ctx, ema_params,
                                   state["teacher_batch_stats"], train=True)
            updates, opt_state = self._teacher_tx.update(g, state["teacher_opt"],
                                                         ema_params)
            new_state["teacher_params"] = optax.apply_updates(ema_params, updates)
            new_state["teacher_opt"] = opt_state
        new_state["ema_step"] = state["ema_step"] + 1
        return new_state

    def eval_params(self, state):
        return state["teacher_params"]

    def eval_batch_stats(self, state):
        return state["teacher_batch_stats"]
