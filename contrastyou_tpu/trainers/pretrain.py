"""Contrastive pretraining trainers.

Capability match for semi_seg/trainers/pretrain.py + _helper.py and
semi_seg/epochers/pretrain.py:24-187:
- train-only epoch loop (no val), ``last`` checkpoint every epoch;
- batches come from the contrastive loader (ContrastBatchSampler for
  acdc/spleen, otherwise infinite sampler with batch = scan_sample_num x
  partition_num capped at 50 — PRETRAIN_BATCH_SIZE_MAX, semi_seg/__init__.py:1);
- the model forward is TRUNCATED at the deepest hooked layer
  (``feature_until_from_hooks``) and all layers after it are FROZEN
  (ref main.py:94-96 switch_grad) — expressed as an optax label tree;
- two fully-independent geometric views on device (the reference's
  ``total_freedom=True`` dataset transform), with the second view's extra
  affine exposed to hooks as the alignment transform.
"""
from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp

from ..engine.hooks import StepContext, TrainerHook, combined_taps
from ..indicator import Indicator
from ..engine.state import TrainState
from ..engine.trainer import Trainer
from ..loggers import logger
from ..meters import AverageValueDictionaryMeter, AverageValueMeter, MeterInterface
from ..models import UNet, trainable_mask
from ..models._base import arch_order
from ..ops.affine import (apply_gamma, apply_geometric, sample_geo_params,
                          transform_image, transform_logits)

PRETRAIN_BATCH_SIZE_MAX = 50


def feature_until_from_hooks(*hooks: TrainerHook,
                             elements=UNet.arch_elements) -> str:
    """Deepest tapped layer -> truncate the forward there
    (ref: semi_seg/hooks/creator.py:44)."""
    taps = [t for h in hooks for t in h.taps]
    if not taps:
        return elements[-1]
    return max(taps, key=lambda n: arch_order(n, elements=elements))


def build_pretrain_step(bundle, optimizer, hooks: t.Sequence[TrainerHook], *,
                        until: str, total_freedom: bool = True,
                        color_jitter: float = 0.0):
    """Jitted contrastive pretrain step: two views, truncated forward,
    regularizer-only loss (ref: epochers/pretrain.py:62-104).

    ``color_jitter`` > 0 applies per-view brightness/contrast jitter of that
    strength — the on-device form of the per-view ColorJitter in the
    reference pretrain transforms (semi_seg/augment.py:37-44 ACDC uses
    [0.5, 1.5] ranges = strength 0.5; prostate [0.9, 1.1] = 0.1).
    """
    hooks = tuple(hooks)
    taps = combined_taps(hooks)

    def loss_fn(trainables, batch_stats, hook_states, batch, rng, epoch):
        params, hook_params = trainables
        from ..data.wire import unwire
        batch = unwire(batch)  # u8 wire format (data/wire.py)
        image = batch["image"]
        k1, k2, k_geo, k_int, k_hook, kj1, kj2 = jax.random.split(rng, 7)
        if total_freedom:
            g1 = sample_geo_params(k1, image.shape[0])
            view1 = apply_gamma(apply_geometric(image, g1, order=0), k1)
            g2 = sample_geo_params(k2, image.shape[0])
            view2_base = apply_gamma(apply_geometric(image, g2, order=0), k2)
        else:
            view1 = image
            view2_base = image
        if color_jitter > 0:
            from ..ops.intensity import color_jitter as _jitter
            view1 = _jitter(view1, kj1, brightness=color_jitter,
                            contrast=color_jitter)
            view2_base = _jitter(view2_base, kj2, brightness=color_jitter,
                                 contrast=color_jitter)
        geo = sample_geo_params(k_geo, image.shape[0])
        view2 = transform_image(view2_base, geo, k_int)

        ctx = StepContext(bundle=bundle, params=params, rng=k_hook,
                          epoch=epoch, geo_params=geo)
        both = jnp.concatenate([view1, view2], axis=0)
        (out, taps_all), batch_stats = bundle.apply_train(
            params, batch_stats, both, until=until, taps=taps)
        n = image.shape[0]
        ctx.unlabeled_image = view1
        ctx.unlabeled_image_tf = view2
        ctx.unlabeled_taps = {k: v[:n] for k, v in taps_all.items()}
        ctx.unlabeled_tf_taps = {k: v[n:] for k, v in taps_all.items()}
        # expose the (possibly truncated) forward output as the "logits" the
        # reference pretrain epocher hands to logit-space hooks (consistency
        # under plot_pretrain_cluster.py:80-102; ref epochers/pretrain.py:66-84
        # does exactly this with the until-truncated forward)
        ctx.unlabeled_logits = out[:n]
        ctx.unlabeled_tf_logits = out[n:]
        ctx.unlabeled_logits_tf = transform_logits(out[:n], geo)
        ctx.batch_stats = batch_stats
        ctx.label_group = batch.get("scan_id")
        ctx.partition_group = batch.get("partition")
        ctx.patient_group = batch.get("patient")
        ctx.cycle_group = batch.get("cycle")
        ctx.superpixel = batch.get("superpixel")

        reg_loss = jnp.float32(0.0)
        new_hook_states = {}
        metrics = {}
        for hook in hooks:
            h_loss, h_state, h_metrics = hook.loss(
                ctx, hook_params[hook.name], hook_states[hook.name])
            reg_loss = reg_loss + hook.weight * h_loss
            new_hook_states[hook.name] = (h_state if h_state is not None
                                          else hook_states[hook.name])
            metrics[f"{hook.name}/loss"] = h_loss
            for mk, mv in h_metrics.items():
                metrics[f"{hook.name}/{mk}"] = mv
        metrics["reg_loss"] = reg_loss
        return reg_loss, (batch_stats, new_hook_states, metrics, ctx)

    def step(state: TrainState, batch, rng, epoch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.trainables, state.batch_stats,
                                  state.hook_states, batch, rng, epoch)
        batch_stats, hook_states, metrics, ctx = aux
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainables)
        params, hook_params = jax.tree.map(lambda p, u: p + u,
                                           state.trainables, updates)
        for hook in hooks:
            hook_states = dict(hook_states)
            hook_states[hook.name] = hook.post_step(ctx, params,
                                                    hook_states[hook.name])
        return TrainState(params=params, batch_stats=batch_stats,
                          hook_params=hook_params, hook_states=hook_states,
                          opt_state=opt_state, step=state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))


class PretrainEncoderTrainer(Trainer):
    """ref: semi_seg/trainers/pretrain.py:120-124."""
    train_mode = "pretrain"
    activate_hooks = True
    total_freedom = True

    def __init__(self, *, contrast_loader=None, monitor_loader=None, **kwargs):
        # the contrastive loader rides the labeled_loader slot for base-class
        # input-shape probing; monitor_loader optionally evaluates a linear
        # probe-style dice during pretrain (ref _PretrainInferenceMixin)
        if contrast_loader is not None:
            kwargs.setdefault("labeled_loader", contrast_loader)
        super().__init__(**kwargs)
        self._contrast_loader = contrast_loader or self._labeled_loader
        self._monitor_loader = monitor_loader
        self._until: str | None = None

    # --- forward_until (ref pretrain.py:36-50) -------------------------
    @property
    def forward_until(self) -> str:
        if self._until is None:
            self._until = feature_until_from_hooks(*self._hooks)
        return self._until

    @forward_until.setter
    def forward_until(self, value: str | None):
        if value is None or value == "all":
            self._until = UNet.arch_elements[-1]
        else:
            arch_order(value, elements=UNet.arch_elements)
            self._until = value

    def _jitter_strength(self) -> float:
        """Per-dataset pretrain ColorJitter strength (ref augment.py:37-44
        ACDC [0.5,1.5]; :118-124 prostate [0.9,1.1]; others none)."""
        data_name = str(self._config.get("Data", {}).get("name", ""))
        if data_name.startswith("acdc"):
            return 0.5
        if data_name.startswith("prostate"):
            return 0.1
        return 0.0

    def _build_steps(self) -> None:
        super()._build_steps()
        self._pretrain_step = build_pretrain_step(
            self._bundle, self._optimizer, self._active_hooks,
            until=self.forward_until, total_freedom=self.total_freedom,
            color_jitter=self._jitter_strength())
        if self._monitor_loader is not None:
            import optax
            # monitoring pass: same graph with a zero optimizer, so hook
            # losses are metered without touching params
            # (ref: _PretrainInferenceEpocherMixin, epochers/pretrain.py:110-165)
            self._monitor_step = build_pretrain_step(
                self._bundle, optax.set_to_zero(), self._active_hooks,
                until=self.forward_until, total_freedom=False)

    def monitor_epoch(self, epoch: int, num_batches: int = 10) -> dict:
        """No-update monitoring pass over the monitor loader."""
        assert self._monitor_loader is not None
        meters = MeterInterface(default_focus="monitor")
        meters.register_meter("reg_loss", AverageValueMeter())
        if not hasattr(self, "_monitor_iter"):
            self._monitor_iter = iter(self._monitor_loader)
        it_loader = self._monitor_iter
        rng = jax.random.fold_in(jax.random.PRNGKey(self._seed), 30_000 + epoch)
        for it in range(num_batches):
            batch = self._device_contrast_batch(next(it_loader))
            # the step donates its input; monitor on a copy
            state_copy = jax.tree.map(jnp.array, self._state)
            _, metrics = self._monitor_step(state_copy, batch,
                                            jax.random.fold_in(rng, it),
                                            jnp.int32(epoch))
            meters.add("reg_loss", metrics["reg_loss"])
        return dict(meters.statistics())

    def _frozen_encoder(self) -> bool:
        """main_cc.py:93-96: ``CrossCorrelationParameters.train_encoder:
        false`` freezes the whole encoder during cc pretraining."""
        cc = self._config.get("CrossCorrelationParameters")
        if isinstance(cc, t.Mapping) and "train_encoder" in cc:
            return not bool(cc["train_encoder"])
        return False

    def _param_labels(self):
        """Freeze every layer AFTER the deepest hooked layer
        (ref main.py:96 switch_grad(False, start=until, include_start=False)),
        optionally AND-merged with an encoder freeze (main_cc.py:93-96).
        Returned as a callable so optax.multi_transform derives labels from
        the live (params, hook_params) structure at init time."""
        until = self.forward_until
        freeze_encoder = self._frozen_encoder()
        if until == UNet.arch_elements[-1] and not freeze_encoder:
            return None

        def label_fn(trainables):
            params, hook_params = trainables
            mask = trainable_mask(params, elements=UNet.arch_elements,
                                  enable=False, start=until,
                                  include_start=False)
            if freeze_encoder:
                from ..models.masks import merge_masks
                enc_mask = trainable_mask(
                    params, elements=UNet.arch_elements, enable=False,
                    start=UNet.arch_elements[0], end=UNet.decoder_names[0],
                    include_start=True, include_end=False)
                mask = merge_masks(mask, enc_mask)
            model_labels = jax.tree.map(
                lambda m: "train" if m else "freeze", mask)
            hook_labels = jax.tree.map(lambda _: "train", hook_params)
            return (model_labels, hook_labels)
        return label_fn

    def _device_contrast_batch(self, batch: dict) -> dict:
        from ..data.wire import pack_array as pk
        out = {"image": jnp.asarray(pk(batch["image"])),
               "partition": jnp.asarray(batch["partition"]),
               "scan_id": jnp.asarray(batch["scan_id"]),
               "patient": jnp.asarray(batch["patient"]),
               "cycle": jnp.asarray(batch["cycle"])}
        if "superpixel" in batch:
            out["superpixel"] = jnp.asarray(pk(batch["superpixel"]))
        return out

    def _start_training(self) -> float:
        for epoch in range(self._cur_epoch, self._max_epoch):
            self._cur_epoch = epoch
            with self._storage:
                tra = self.tra_epoch(epoch)
                stages = {"tra": tra}
                if self._monitor_loader is not None:
                    stages["monitor"] = self.monitor_epoch(epoch)
                self._storage.add_from_meter_interface(epoch=epoch, **stages)
                self._writer.add_scalars_from_meter_interface(epoch=epoch,
                                                              **stages)
            self.save_to("last")
        from .. import success
        success(self._save_dir)
        return 0.0

    def tra_epoch(self, epoch: int) -> dict:
        meters = MeterInterface(default_focus="pretrain")
        meters.register_meter("reg_loss", AverageValueMeter())
        hook_meters = {}
        for hook in self._active_hooks:
            with meters.focus_on(hook.name):
                hook_meters[hook.name] = meters.register_meter(
                    "metrics", AverageValueDictionaryMeter())
        if not hasattr(self, "_contrast_iter"):
            self._contrast_iter = iter(self._contrast_loader)
        it_loader = self._contrast_iter
        rng = jax.random.fold_in(jax.random.PRNGKey(self._seed), 20_000 + epoch)
        epoch_arr = jnp.int32(epoch)
        indicator = Indicator(range(self._num_batches))
        indicator.set_description(f"pretrain {epoch:03d}")
        from ..data.wire import DevicePrefetcher, prefetch_depth

        def _produce():
            for _ in range(self._num_batches):
                yield self._device_contrast_batch(next(it_loader))

        depth = prefetch_depth()
        feed = iter(DevicePrefetcher(_produce(), depth=depth)
                    if depth else _produce())
        with meters:
            for it in indicator:
                batch = next(feed)
                self._state, metrics = self._pretrain_step(
                    self._state, batch, jax.random.fold_in(rng, it), epoch_arr)
                meters.add("reg_loss", metrics["reg_loss"])
                for hook in self._active_hooks:
                    hm = {k.split("/", 1)[1]: v for k, v in metrics.items()
                          if k.startswith(hook.name + "/")
                          and "/fig/" not in k}
                    hook_meters[hook.name].add(**hm)
                indicator.set_postfix_statics(
                    {"pretrain": {"reg": meters["reg_loss"].summary()}},
                    force_update=it == self._num_batches - 1)
        return dict(meters.statistics())


class PretrainDecoderTrainer(PretrainEncoderTrainer):
    """ref: semi_seg/trainers/pretrain.py:126-129 — decoder hooks; identical
    loop, decoder-layer taps define the truncation point."""


def get_contrastive_loader(dataset, *, data_name: str, scan_sample_num: int = 6,
                           partition_sample_num: int = 1, seed: int = 0,
                           batch_size_max: int = PRETRAIN_BATCH_SIZE_MAX):
    """ref: semi_seg/trainers/_helper.py:33-93 ``_get_contrastive_dataloader``."""
    from ..data.loader import BatchLoader
    from ..data.sampler import ContrastBatchSampler, InfiniteRandomSampler

    if data_name.startswith("acdc") or data_name == "spleen":
        sampler = ContrastBatchSampler(dataset,
                                       scan_sample_num=scan_sample_num,
                                       partition_sample_num=partition_sample_num,
                                       seed=seed)
        pad_to = min(sampler.batch_size, batch_size_max)
        return BatchLoader(dataset, batch_sampler=sampler, pad_to=pad_to,
                           seed=seed, infinite=True)
    batch_size = min(scan_sample_num * dataset.partition_num
                     * partition_sample_num, batch_size_max)
    logger.debug(f"{data_name}: infinite contrastive loader bs={batch_size}")
    return BatchLoader(dataset,
                       sampler=InfiniteRandomSampler(len(dataset), seed=seed),
                       batch_size=batch_size, seed=seed)
