"""Adversarial semi-supervised trainer (DCGAN-style alternating updates).

Capability match for semi_seg/epochers/comparable.py:93-200
``AdversarialEpocher`` + trainers/trainer.py:215-260 ``AdversarialTrainer``:
- generator step: supervised KL + reg_weight * BCE(D(softmax(unlabeled)), real);
- discriminator step: BCE(D(labeled probs), real) + BCE(D(unlabeled probs),
  fake), with detached segmenter outputs, scaled by reg_weight;
- optional image-conditioned discriminator input (``dis_consider_image``).

TPU design: BOTH alternating updates are fused into one jitted step over an
extended state (segmenter + discriminator params/optimizers), so the whole
adversarial iteration is one XLA program.
"""
from __future__ import annotations

import typing as t

import flax.struct
import jax
import jax.numpy as jnp
import optax
from ..indicator import Indicator

from ..engine.bundle import ModelBundle
from ..engine.optim import create_optimizer
from ..engine.trainer import Trainer
from ..losses.kl import kl_div
from ..meters import AverageValueMeter, MeterInterface, UniversalDice
from ..meters.dice import slice_intersection_union
from ..models.discriminator import Discriminator


@flax.struct.dataclass
class AdvState:
    params: t.Any
    batch_stats: t.Any
    opt_state: t.Any
    disc_params: t.Any
    disc_batch_stats: t.Any
    disc_opt_state: t.Any
    step: jnp.ndarray


def _bce(pred, target_value: float):
    target = jnp.full_like(pred, target_value)
    return -(target * jnp.log(pred + 1e-8)
             + (1 - target) * jnp.log(1 - pred + 1e-8)).mean()


def build_adversarial_step(bundle: ModelBundle, disc: Discriminator,
                           gen_tx, disc_tx, *, reg_weight: float,
                           dis_consider_image: bool, num_classes: int):
    def disc_input(image, probs):
        if dis_consider_image:
            return jnp.concatenate([image, probs], axis=-1)
        return probs

    def gen_loss_fn(params, batch_stats, disc_params, disc_stats, batch):
        from ..data.wire import unwire
        batch = unwire(batch)  # u8 wire format (data/wire.py)
        (labeled_logits, _), batch_stats = bundle.apply_train(
            params, batch_stats, batch["labeled_image"])
        onehot = jax.nn.one_hot(batch["labeled_target"], num_classes)
        probs = jax.nn.softmax(labeled_logits, axis=-1)
        sup_loss = kl_div(probs, onehot)
        gen_err = jnp.float32(0.0)
        unlabeled_probs = None
        if reg_weight > 0:
            (unlabeled_logits, _), batch_stats = bundle.apply_train(
                params, batch_stats, batch["unlabeled_image"])
            unlabeled_probs = jax.nn.softmax(unlabeled_logits, axis=-1)
            d_out, _ = disc.apply(
                {"params": disc_params, "batch_stats": disc_stats},
                disc_input(batch["unlabeled_image"], unlabeled_probs),
                train=True, mutable=["batch_stats"])
            gen_err = _bce(d_out, 1.0)
        total = sup_loss + reg_weight * gen_err
        pred = jnp.argmax(labeled_logits, axis=-1)
        inter, union = slice_intersection_union(pred, batch["labeled_target"],
                                                num_classes=num_classes)
        aux = (batch_stats, probs, unlabeled_probs, sup_loss, gen_err,
               (inter, union))
        return total, aux

    def disc_loss_fn(disc_params, disc_stats, batch, labeled_probs,
                     unlabeled_probs):
        from ..data.wire import unwire
        batch = unwire(batch)
        out_l, mut = disc.apply(
            {"params": disc_params, "batch_stats": disc_stats},
            disc_input(batch["labeled_image"], labeled_probs),
            train=True, mutable=["batch_stats"])
        err_l = _bce(out_l, 1.0)
        out_u, mut = disc.apply(
            {"params": disc_params, "batch_stats": mut["batch_stats"]},
            disc_input(batch["unlabeled_image"], unlabeled_probs),
            train=True, mutable=["batch_stats"])
        err_u = _bce(out_u, 0.0)
        return (err_l + err_u) * reg_weight, (mut["batch_stats"], err_l + err_u)

    @jax.jit
    def step(state: AdvState, batch):
        (_, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.disc_params,
            state.disc_batch_stats, batch)
        batch_stats, labeled_probs, unlabeled_probs, sup_loss, gen_err, iu = aux
        updates, opt_state = gen_tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        disc_params, disc_stats, disc_opt_state = (state.disc_params,
                                                   state.disc_batch_stats,
                                                   state.disc_opt_state)
        disc_loss = jnp.float32(0.0)
        if reg_weight > 0:
            (_, (disc_stats, disc_loss)), dgrads = jax.value_and_grad(
                disc_loss_fn, has_aux=True)(
                    disc_params, disc_stats, batch,
                    jax.lax.stop_gradient(labeled_probs),
                    jax.lax.stop_gradient(unlabeled_probs))
            dupdates, disc_opt_state = disc_tx.update(dgrads, disc_opt_state,
                                                      disc_params)
            disc_params = optax.apply_updates(disc_params, dupdates)

        metrics = {"sup_loss": sup_loss, "gen_loss": gen_err,
                   "dis_loss": disc_loss, "dice_inter": iu[0],
                   "dice_union": iu[1]}
        return AdvState(params=params, batch_stats=batch_stats,
                        opt_state=opt_state, disc_params=disc_params,
                        disc_batch_stats=disc_stats,
                        disc_opt_state=disc_opt_state,
                        step=state.step + 1), metrics

    return step


class AdversarialTrainer(Trainer):
    activate_hooks = False
    train_mode = "ft"  # base class builds the eval step; train step is custom

    def __init__(self, *, reg_weight: float = 0.01,
                 dis_consider_image: bool = False, **kwargs):
        super().__init__(**kwargs)
        self._reg_weight = float(reg_weight)
        self._dis_consider_image = bool(dis_consider_image)

    def init(self) -> None:
        super().init()
        num_classes = self._bundle.num_classes
        input_dim = num_classes + (self._bundle.input_shape[-1]
                                   if self._dis_consider_image else 0)
        self._disc = Discriminator(input_dim=input_dim,
                                   dtype=self._model.dtype)
        h, w, _ = self._bundle.input_shape
        dvars = self._disc.init(jax.random.PRNGKey(self._seed + 7),
                                jnp.zeros((2, h, w, input_dim)), train=False)
        optim_params = dict(self._config.get("Optim", {"name": "adam",
                                                       "lr": 1e-4}))
        self._disc_tx, _ = create_optimizer(optim_params, None,
                                            max_epoch=self._max_epoch,
                                            steps_per_epoch=self._num_batches)
        self._adv_state = AdvState(
            params=self._state.params, batch_stats=self._state.batch_stats,
            opt_state=self._gen_tx.init(self._state.params),
            disc_params=dvars["params"],
            disc_batch_stats=dvars.get("batch_stats", {}),
            disc_opt_state=self._disc_tx.init(dvars["params"]),
            step=jnp.int32(0))
        self._adv_step = build_adversarial_step(
            self._bundle, self._disc, self._gen_tx, self._disc_tx,
            reg_weight=self._reg_weight,
            dis_consider_image=self._dis_consider_image,
            num_classes=num_classes)

    def _build_steps(self) -> None:
        # generator optimizer over model params only (no hooks)
        from ..engine.steps import build_eval_step
        self._gen_tx, _ = create_optimizer(
            self._config.get("Optim", {}), self._config.get("Scheduler", {}),
            max_epoch=self._max_epoch, steps_per_epoch=self._num_batches)
        self._eval_step = build_eval_step(self._bundle)

    def _inference_state(self):
        return self._adv_state.params, self._adv_state.batch_stats

    def tra_epoch(self, epoch: int) -> dict:
        num_classes = self._bundle.num_classes
        meters = MeterInterface(default_focus="tra")
        meters.register_meter("sup_loss", AverageValueMeter())
        meters.register_meter("sup_dice", UniversalDice(
            num_classes, report_axis=range(1, num_classes)))
        with meters.focus_on("adv_reg"):
            meters.register_meter("dis_loss", AverageValueMeter())
            meters.register_meter("gen_loss", AverageValueMeter())
        labeled_iter, unlabeled_iter = self._train_iterators()
        indicator = Indicator(range(self._num_batches))
        indicator.set_description(f"adv {epoch:03d}")
        from ..data.wire import DevicePrefetcher, pack_array, prefetch_depth

        def _produce():
            for _ in range(self._num_batches):
                labeled = next(labeled_iter)
                unlabeled = next(unlabeled_iter)
                yield {
                    "labeled_image": jnp.asarray(pack_array(labeled["image"])),
                    "labeled_target": jnp.asarray(
                        pack_array(labeled["target"])),
                    "unlabeled_image": jnp.asarray(
                        pack_array(unlabeled["image"])),
                }, labeled["scan"]

        depth = prefetch_depth()
        feed = iter(DevicePrefetcher(_produce(), depth=depth)
                    if depth else _produce())
        with meters:
            for _ in indicator:
                batch, scans = next(feed)
                self._adv_state, metrics = self._adv_step(self._adv_state, batch)
                meters.add("sup_loss", metrics["sup_loss"])
                meters["sup_dice"].add_counts(metrics["dice_inter"],
                                              metrics["dice_union"],
                                              group_name=scans)
                with meters.focus_on("adv_reg"):
                    meters.add("dis_loss", metrics["dis_loss"])
                    meters.add("gen_loss", metrics["gen_loss"])
        return dict(meters.statistics())
