"""InfoNCE contrastive hooks: encoder (global), decoder (dense sampled
points), self-paced, and superpixel-labeled variants.

Capability match for semi_seg/hooks/infonce.py:84-360 and the label
generators of semi_seg/epochers/helper.py:54-71 / hooks/utils.py:21-103:
- tap a named layer on both views, align view-1 features with the batch
  transform, project+L2-normalize, SupCon over positive pairs defined by
  ``contrast_on`` in {partition, patient, cycle, self};
- decoder variant samples ``point_nums`` random spatial positions per image
  (IDENTICAL positions in both views — here guaranteed by a shared PRNG key
  rather than seed replay) and treats each point as its own positive pair;
- self-paced variant ramps the age parameter gamma with the epoch IN-GRAPH
  (ref PScheduler, infonce.py:58-81) so no retracing per epoch;
- superpixel variant derives point labels from a superpixel map aligned and
  pooled to the feature grid.

TPU/distributed note: under a data mesh the 2N x 2N similarity matmul is
computed over batch-sharded normalized features; XLA inserts the all-gather,
so the loss sees the GLOBAL batch exactly like the reference's effective-batch
semantics from ContrastBatchSampler composition.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..engine.bundle import ModelBundle
from ..engine.hooks import StepContext, TrainerHook
from ..losses.contrastive import self_paced_sup_con_loss, sup_con_loss
from ..models import UNet
from ..models.projectors import DenseProjectionHead, ProjectionHead
from ..perf import get as perf_knob

ENCODER_NAMES = UNet.encoder_names


def contrast_labels(ctx: StepContext, contrast_on: str) -> Optional[jnp.ndarray]:
    """Integer labels defining positive pairs (ref label generators)."""
    if contrast_on == "partition":
        # partition index is only comparable within the same dataset; combine
        # with nothing else — slices at the same anatomical third are positives
        return ctx.partition_group
    if contrast_on == "patient":
        return ctx.patient_group
    if contrast_on == "cycle":
        return ctx.cycle_group
    if contrast_on == "self":
        return None  # SimCLR: identity positives
    raise NotImplementedError(contrast_on)


def majority_pool_labels(ids: jnp.ndarray, fh: int, fw: int, *,
                         num_ids: int = 256) -> jnp.ndarray:
    """Area-majority pooling of an integer id map [B, H, W] to the [fh, fw]
    feature grid: each cell takes the most frequent id inside its window.

    Replaces the reference's nearest-neighbor downsampling of the superpixel
    map (semi_seg/hooks/infonce.py:336-341 F.interpolate mode='nearest'),
    which picks the window's corner pixel — majority keeps the label aligned
    with the feature cell's whole receptive field. Superpixel ids are uint8 in
    the reference (infonce.py:332 * 255 -> uint8), hence num_ids=256.
    """
    B, H, W = ids.shape
    ph, pw = max(H // fh, 1), max(W // fw, 1)
    r = ids[:, :fh * ph, :fw * pw].reshape(B, fh, ph, fw, pw)
    counts = (r[..., None] == jnp.arange(num_ids, dtype=ids.dtype)
              ).astype(jnp.int32).sum(axis=(2, 4))               # B,fh,fw,K
    return jnp.argmax(counts, axis=-1).astype(jnp.int32)


def sample_points(features: jnp.ndarray, key: jax.Array, point_nums: int
                  ) -> jnp.ndarray:
    """Pick ``point_nums`` random spatial positions per image -> [B*P, d]
    (ref region_extractor, infonce.py:31-46). Both views must be sampled with
    the SAME key to align positives."""
    B, H, W, D = features.shape
    keys = jax.random.split(key, B)

    def per_image(feat, k):
        kh, kw = jax.random.split(k)
        ys = jax.random.choice(kh, H, (point_nums,), replace=False)
        xs = jax.random.choice(kw, W, (point_nums,), replace=False)
        return feat[ys, xs]                      # [P, d]

    return jax.vmap(per_image)(features, keys).reshape(B * point_nums, D)


class INFONCEHook(TrainerHook):
    def __init__(self, *, name: str, feature_name: str, weight: float = 1.0,
                 spatial_size: Sequence[int] | None = None,
                 data_name: str = "acdc", contrast_on: str = "partition",
                 point_nums: int = 5, temperature: float = 0.07,
                 emit_figures: bool = False):
        super().__init__(hook_name=name, weight=weight)
        self._emit_figures = bool(emit_figures)
        self._feature_name = feature_name
        self.taps = (feature_name,)
        self._is_encoder = feature_name in ENCODER_NAMES
        self._contrast_on = contrast_on
        self._data_name = data_name
        self._point_nums = int(point_nums)
        self._temperature = float(temperature)
        if self._is_encoder:
            assert spatial_size is None or tuple(spatial_size) == (1, 1)
            self._projector = ProjectionHead(output_dim=256, hidden_dim=256,
                                             head_type="mlp", normalize=True)
        else:
            assert spatial_size is not None
            self._projector = DenseProjectionHead(
                output_dim=256, hidden_dim=256, head_type="mlp",
                normalize=True, spatial_size=tuple(spatial_size))

    def init(self, rng, bundle: ModelBundle) -> Tuple:
        dim = bundle.get_channel_dim(self._feature_name)
        dummy = jnp.zeros((2, 16, 16, dim))
        return self._projector.init(rng, dummy)["params"], None

    def _projected_pair(self, ctx: StepContext, params):
        feat = ctx.unlabeled_taps[self._feature_name]
        feat_tf = ctx.unlabeled_tf_taps[self._feature_name]
        # taps are exact f32 upcasts of bf16 activations — the affine
        # alignment (nearest warp = exact selection) rides bf16 losslessly,
        # halving the HBM traffic of the wide dense-decoder taps (same
        # reasoning as the IIC kernel path, CONTRASTYOU_IIC_BF16); the
        # projector promotes back to f32 (f32 params).
        import os
        mdt = getattr(getattr(ctx.bundle, "model", None), "dtype", None)
        # dense (decoder) hooks only: DenseProjectionHead's hidden conv
        # promotes to f32 before any pooling (and under POOL_EARLY the head
        # upcasts bf16 itself before an early pool), so the spatial mean
        # always accumulates in f32; the encoder ProjectionHead pools the
        # raw features, which must stay f32 accumulation (and its 14^2 taps
        # are too small to matter anyway)
        if (mdt == jnp.bfloat16 and feat.dtype == jnp.float32
                and not self._is_encoder
                and perf_knob("NCE_BF16") != "0"):
            feat, feat_tf = feat.astype(mdt), feat_tf.astype(mdt)
        feat_aligned = ctx.affine_transformer(feat)
        both = jnp.concatenate([feat_aligned, feat_tf], axis=0)
        proj = self._projector.apply({"params": params}, both)
        B = feat.shape[0]
        proj = proj.astype(jnp.float32)
        return proj[:B], proj[B:]

    def _pairs_and_labels(self, ctx: StepContext, params):
        f1, f2 = self._projected_pair(ctx, params)
        if self._is_encoder:
            return f1, f2, contrast_labels(ctx, self._contrast_on)
        key = ctx.rng if ctx.rng is not None else jax.random.PRNGKey(0)
        p1 = sample_points(f1, key, self._point_nums)
        p2 = sample_points(f2, key, self._point_nums)
        return p1, p2, None  # each point its own positive (SimCLR labels)

    def loss(self, ctx: StepContext, params, state):
        f1, f2, labels = self._pairs_and_labels(ctx, params)
        if self._emit_figures:
            # figure tensors ride the metrics dict under the fig/ prefix; the
            # trainer renders the first batch of each epoch to TensorBoard
            # (ref: infonce.py:49-56 figure2board)
            loss, aux = sup_con_loss(f1, f2, target=labels,
                                     temperature=self._temperature,
                                     return_aux=True)
            return loss, state, {"fig/sim_logits": aux["sim_logits"],
                                 "fig/pos_mask": aux["pos_mask"]}
        loss = sup_con_loss(f1, f2, target=labels,
                            temperature=self._temperature)
        return loss, state, {}


class SelfPacedINFONCEHook(INFONCEHook):
    def __init__(self, *, name: str, feature_name: str, weight: float = 1.0,
                 spatial_size=None, data_name: str = "acdc",
                 contrast_on: str = "partition", mode: str = "soft",
                 p: float = 0.5, begin_value: float = 1e6,
                 end_value: float = 1e6, correct_grad: bool = False,
                 max_epoch: int = 100, **kwargs):
        super().__init__(name=name, feature_name=feature_name, weight=weight,
                         spatial_size=spatial_size, data_name=data_name,
                         contrast_on=contrast_on, **kwargs)
        self._mode = mode
        self._p = float(p)
        self._begin = float(begin_value)
        self._end = float(end_value)
        self._correct_grad = bool(correct_grad)
        self._max_epoch = int(max_epoch)

    def _gamma(self, epoch):
        ramp = jnp.power(epoch.astype(jnp.float32) / self._max_epoch, self._p)
        return self._begin + (self._end - self._begin) * ramp

    def loss(self, ctx: StepContext, params, state):
        f1, f2, labels = self._pairs_and_labels(ctx, params)
        gamma = self._gamma(ctx.epoch)
        loss, metrics = self_paced_sup_con_loss(
            f1, f2, target=labels, gamma=gamma,
            temperature=self._temperature, weight_update=self._mode,
            correct_grad=self._correct_grad)
        return loss, state, {"sp_weight": metrics["downgrade_ratio"],
                             "age_param": gamma}


class SuperPixelInfoNCEHook(INFONCEHook):
    """Decoder-only: point labels from the superpixel map (ref infonce.py:
    180-360). The superpixel channel rides the unlabeled batch (dataset
    sub-folder ``superpixel``)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        assert not self._is_encoder, "superpixel InfoNCE needs decoder features"

    def loss(self, ctx: StepContext, params, state):
        assert ctx.superpixel is not None, \
            "batch lacks 'superpixel' — use the acdc_superpixel dataset"
        f1, f2 = self._projected_pair(ctx, params)
        key = ctx.rng if ctx.rng is not None else jax.random.PRNGKey(0)
        p1 = sample_points(f1, key, self._point_nums)
        p2 = sample_points(f2, key, self._point_nums)

        sp = ctx.superpixel.astype(jnp.float32)[..., None]     # [B, H, W, 1]
        sp_tf = ctx.affine_transformer(sp, order=0)
        fh, fw = f1.shape[1], f1.shape[2]
        sp_pooled = majority_pool_labels(
            sp_tf[..., 0].astype(jnp.int32), fh, fw)           # [B, fh, fw]
        sp_points = sample_points(sp_pooled[..., None].astype(jnp.float32),
                                  key, self._point_nums)
        labels = sp_points[:, 0].astype(jnp.int32)
        loss = sup_con_loss(p1, p2, target=labels,
                            temperature=self._temperature)
        return loss, state, {}
