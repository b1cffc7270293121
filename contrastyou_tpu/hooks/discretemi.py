"""Discrete-MI hooks on intermediate features (ref: semi_seg/hooks/
discretemi.py:16-176): tap a named layer, project through a multi-subhead
cluster head (ClusterHead for encoder layers, DenseClusterHead for decoder
layers), maximize IIC mutual information between the aligned view pair; the
IMSAT variant adds an output-space IMSAT term + subhead consistency.

TPU notes: the reference runs each subhead sequentially; here subheads are a
stacked axis from the vmapped heads, so the per-subhead IIC losses are one
vmapped joint-matrix batch (small k x k matmuls batched onto the MXU)."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..engine.bundle import ModelBundle
from ..engine.hooks import StepContext, TrainerHook
from ..losses.discrete_mi import (iid_loss, iid_segmentation_loss, imsat_loss)
from ..models import UNet
from ..models.projectors import ClusterHead, DenseClusterHead
from ..perf import get as perf_knob

ENCODER_NAMES = UNet.encoder_names
DECODER_NAMES = UNet.decoder_names


class DiscreteMITrainHook(TrainerHook):
    def __init__(self, *, name: str, feature_name: str, weight: float = 1.0,
                 num_clusters: int = 20, num_subheads: int = 5,
                 padding: int | None = None):
        super().__init__(hook_name=name, weight=weight)
        assert feature_name in ENCODER_NAMES + DECODER_NAMES, feature_name
        self._feature_name = feature_name
        self.taps = (feature_name,)
        self._is_encoder = feature_name in ENCODER_NAMES
        self._padding = int(padding or 0)
        if self._is_encoder:
            self._projector = ClusterHead(num_clusters=num_clusters,
                                          num_subheads=num_subheads,
                                          head_type="linear", T=1.0,
                                          normalize=False)
        else:
            self._projector = DenseClusterHead(num_clusters=num_clusters,
                                               num_subheads=num_subheads,
                                               head_type="linear", T=1.0,
                                               normalize=False)

    def init(self, rng, bundle: ModelBundle) -> Tuple:
        dim = bundle.get_channel_dim(self._feature_name)
        dummy = jnp.zeros((2, 8, 8, dim))
        params = self._projector.init(rng, dummy)["params"]
        return params, None

    def _paired_probs(self, ctx: StepContext, params):
        """-> (probs_view1_aligned, probs_view2), each [S, B, ..., K]."""
        feat = ctx.unlabeled_taps[self._feature_name]
        feat_tf = ctx.unlabeled_tf_taps[self._feature_name]
        feat_aligned = ctx.affine_transformer(feat)
        both = jnp.concatenate([feat_aligned, feat_tf], axis=0)
        probs = self._projector.apply({"params": params}, both)  # [S, 2B, ...]
        B = feat.shape[0]
        return probs[:, :B], probs[:, B:]

    def _mi_per_subhead(self, p1, p2):
        if self._is_encoder:
            return jax.vmap(lambda a, b: iid_loss(a, b)[0])(p1, p2)
        return jax.vmap(lambda a, b: iid_segmentation_loss(
            a, b, padding=self._padding))(p1, p2)

    def _dense_linear(self) -> bool:
        return not self._is_encoder and self._projector.head_type == "linear"

    def _use_merged(self) -> bool:
        """Dense linear heads route through the MXU-merged formulation
        (projection + displacement joints in the S*K-lane layout; round-3
        udaiic optimization, BENCH_NOTES). CONTRASTYOU_IIC_MERGED=0 falls
        back to the vmapped per-subhead path (the equivalence-test A/B)."""
        import os
        return (self._dense_linear()
                and perf_knob("IIC_MERGED")
                not in ("0", "kernel"))

    def _use_kernel(self) -> bool:
        from ..ops.pallas.iic import use_iic_kernel
        return self._dense_linear() and use_iic_kernel()

    def loss(self, ctx: StepContext, params, state):
        if self._use_kernel():
            from ..losses.discrete_mi import iid_loss_from_raw_joints
            from ..ops.pallas.iic import fused_dense_iic_raw_joints
            feat = ctx.unlabeled_taps[self._feature_name]
            feat_tf = ctx.unlabeled_tf_taps[self._feature_name]
            # taps are f32 UPCASTS of the model's bf16 activations — the
            # affine alignment + chunked kernel input can ride bf16
            # losslessly (nearest warp = exact selection; the kernel
            # upcasts to f32 in VMEM), halving the HBM traffic of the
            # warp/chunk glue (round-3: ~38 ms/step of where/roll in the
            # udaiic trace was the f32 feature warp)
            import os
            mdt = getattr(getattr(ctx.bundle, "model", None), "dtype", None)
            if (mdt == jnp.bfloat16 and feat.dtype == jnp.float32
                    and perf_knob("IIC_BF16") != "0"):
                feat = feat.astype(mdt)
                feat_tf = feat_tf.astype(mdt)
            conv = params["Vmap_DenseSubHead_0"]["Conv_0"]
            S = self._projector.num_subheads
            K = self._projector.num_clusters
            C = conv["kernel"].shape[-2]
            w = jnp.transpose(conv["kernel"].reshape(S, C, K),
                              (1, 0, 2)).reshape(C, S * K)
            b = conv["bias"].reshape(S * K)
            raw = fused_dense_iic_raw_joints(
                w, b, ctx.affine_transformer(feat), feat_tf,
                num_subheads=S, num_clusters=K, padding=self._padding,
                T=self._projector.T)
            B, H, W = feat.shape[0], feat.shape[1], feat.shape[2]
            mi = iid_loss_from_raw_joints(
                raw, padding=self._padding, count=B * H * W).mean()
            return mi, state, {"mi": mi}
        if self._use_merged():
            from ..losses.discrete_mi import iid_segmentation_loss_merged
            from ..models.projectors import dense_cluster_probs_merged
            feat = ctx.unlabeled_taps[self._feature_name]
            feat_tf = ctx.unlabeled_tf_taps[self._feature_name]
            both = jnp.concatenate([ctx.affine_transformer(feat), feat_tf], 0)
            pm = dense_cluster_probs_merged(
                params, both, num_subheads=self._projector.num_subheads,
                num_clusters=self._projector.num_clusters,
                T=self._projector.T)
            B = feat.shape[0]
            mi = iid_segmentation_loss_merged(
                pm[:B], pm[B:], num_subheads=self._projector.num_subheads,
                num_clusters=self._projector.num_clusters,
                padding=self._padding).mean()
            return mi, state, {"mi": mi}
        p1, p2 = self._paired_probs(ctx, params)
        mi = self._mi_per_subhead(p1, p2).mean()
        return mi, state, {"mi": mi}


class DiscreteIMSATTrainHook(DiscreteMITrainHook):
    """IMSAT on the cluster distributions + MSE consistency across views
    (ref: discretemi.py:120-176)."""

    def __init__(self, *, name: str, feature_name: str, weight: float = 1.0,
                 num_clusters: int = 20, num_subheads: int = 5,
                 cons_weight: float = 1.0):
        super().__init__(name=name, feature_name=feature_name, weight=weight,
                         num_clusters=num_clusters, num_subheads=num_subheads)
        self._cons_weight = float(cons_weight)

    def loss(self, ctx: StepContext, params, state):
        p1, p2 = self._paired_probs(ctx, params)

        def one(a, b):
            flat_a = a.reshape(-1, a.shape[-1])
            flat_b = b.reshape(-1, b.shape[-1])
            return 0.5 * (imsat_loss(flat_a) + imsat_loss(flat_b))

        mi = jax.vmap(one)(p1, p2).mean()
        cons = jnp.mean((p1 - p2) ** 2)
        total = mi + self._cons_weight * cons
        return total, state, {"mi": mi, "cons": cons}
