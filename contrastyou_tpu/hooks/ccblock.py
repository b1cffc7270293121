"""Cross-correlation block: the boundary-aware cluster regularizer.

Capability match for semi_seg/hooks/ccblock.py:38-490 and cc.py:21-146:
a tapped feature map (or the final prediction for ``Deconv_1x1``) is projected
to over-segmented cluster distributions (CrossCorrelationProjector, 1+
subheads); a set of micro-losses ("tiny hooks", ref _TinyHook :38-69) runs on
the aligned distribution pair:
- ``cc``: windowed NCC between the image edge map and the cluster-entropy edge
  map (boundary alignment; ref _CrossCorrelationHook :242-309) — computed in
  f32 (the reference disables AMP here);
- ``mi``: spatial IIC (ref _MIHook :312-339);
- ``rr``: Barlow-Twins/IIC redundancy criterion (ref _RedundancyReduction);
- ``imsat``: IMSAT with a dynamically adapted marginal weight, carried as hook
  state (ref _IMSATHook + IMSATDynamicWeight, losses/discreteMI.py:56-88);
- ``consist``: KL(dist1, stop_grad(dist2)) (ref _ConsistencyHook :475-490).
"""
from __future__ import annotations

import math
import typing as t

import jax
import jax.numpy as jnp

from ..engine.bundle import ModelBundle
from ..engine.hooks import StepContext, TrainerHook
from ..losses.cross_correlation import windowed_ncc_loss
from ..losses.discrete_mi import imsat_terms, iid_segmentation_loss
from ..losses.kl import kl_div
from ..losses.redundancy import redundancy_criterion
from ..models import UNet
from ..models.projectors import CrossCorrelationProjector


def _edge_map(image: jnp.ndarray) -> jnp.ndarray:
    """Roll-difference gradient magnitude, averaged over channels -> [B,H,W,1]
    (ref ccblock.py diff())."""
    dx = image - jnp.roll(image, 1, axis=1)
    dy = image - jnp.roll(image, 1, axis=2)
    return jnp.sqrt(dx ** 2 + dy ** 2).mean(axis=-1, keepdims=True)


def _norm01_per_slice(x: jnp.ndarray) -> jnp.ndarray:
    lo = jax.lax.stop_gradient(x.min(axis=(1, 2, 3), keepdims=True))
    hi = jax.lax.stop_gradient(x.max(axis=(1, 2, 3), keepdims=True))
    return (x - lo) / (hi - lo + 1e-6)


def cc_edge_loss(image: jnp.ndarray, predict_simplex: jnp.ndarray, *,
                 kernel_size: int, diff_power: float) -> jnp.ndarray:
    """NCC between normalized image-edge map^power and normalized cluster
    entropy map (ref cc_loss_per_head :283-309)."""
    image = image.astype(jnp.float32)
    h, w = predict_simplex.shape[1:3]
    if image.shape[1:3] != (h, w):
        image = jax.image.resize(image, (image.shape[0], h, w, image.shape[-1]),
                                 method="bilinear")
    diff_image = _norm01_per_slice(_edge_map(image)) ** diff_power
    ent = -(predict_simplex
            * jnp.log(predict_simplex + 1e-16)).sum(-1, keepdims=True)
    diff_ent = _norm01_per_slice(ent)
    return windowed_ncc_loss(diff_ent, diff_image,
                             win=(kernel_size, kernel_size))


class CrossCorrelationHook(TrainerHook):
    def __init__(self, *, name: str, feature_name: str, num_clusters: int = 20,
                 head_type: str = "mlp", num_subheads: int = 1,
                 num_classes: int = 4, hooks: t.Mapping[str, t.Mapping],
                 save: bool = False):
        super().__init__(hook_name=name, weight=1.0)
        self._feature_name = feature_name
        self._on_logits = feature_name == "Deconv_1x1"
        self.taps = () if self._on_logits else (feature_name,)
        self._tiny = {k: dict(v) for k, v in dict(hooks).items()}
        self._num_clusters = int(num_clusters)
        self._save = save
        if not self._on_logits:
            self._projector = CrossCorrelationProjector(
                num_clusters=num_clusters, head_type=head_type,
                num_subheads=num_subheads, hidden_dim=64, normalize=False)

    def init(self, rng, bundle: ModelBundle):
        state = {}
        if "imsat" in self._tiny:
            state["imsat_weight"] = jnp.float32(
                self._tiny["imsat"].get("lamda", 1.0))
        if self._on_logits:
            return None, state
        dim = bundle.get_channel_dim(self._feature_name)
        dummy = jnp.zeros((2, 8, 8, dim))
        return self._projector.init(rng, dummy)["params"], state

    def _distributions(self, ctx: StepContext, params):
        """-> (dist_tf, tf_dist) stacked [S, B, h, w, K]: view-1 aligned and
        view-2 cluster distributions."""
        if self._on_logits:
            d1 = jax.nn.softmax(ctx.unlabeled_logits_tf, axis=-1)[None]
            d2 = jax.nn.softmax(ctx.unlabeled_tf_logits, axis=-1)[None]
            return d1, d2
        feat = ctx.unlabeled_taps[self._feature_name]
        feat_tf = ctx.unlabeled_tf_taps[self._feature_name]
        feat_aligned = ctx.affine_transformer(feat)
        both = jnp.concatenate([feat_aligned, feat_tf], axis=0)
        dists = self._projector.apply({"params": params}, both)
        B = feat.shape[0]
        return dists[:, :B], dists[:, B:]

    def loss(self, ctx: StepContext, params, state):
        dist_tf, tf_dist = self._distributions(ctx, params)
        S = dist_tf.shape[0]
        total = jnp.float32(0.0)
        metrics: dict = {}
        new_state = dict(state)

        def per_subhead(fn):
            return jax.vmap(fn)(dist_tf, tf_dist).mean()

        if "cc" in self._tiny:
            p = self._tiny["cc"]
            img = ctx.unlabeled_image_tf

            def _cc(d1, d2):
                a = cc_edge_loss(img, d1, kernel_size=int(p["kernel_size"]),
                                 diff_power=float(p.get("diff_power", 0.75)))
                b = cc_edge_loss(img, d2, kernel_size=int(p["kernel_size"]),
                                 diff_power=float(p.get("diff_power", 0.75)))
                return (a + b) / 2.0
            cc = per_subhead(_cc)
            total += float(p["weight"]) * cc
            metrics["cc"] = cc
        if "mi" in self._tiny:
            p = self._tiny["mi"]
            mi = per_subhead(lambda d1, d2: iid_segmentation_loss(
                d1, d2, lamda=float(p.get("lamda", 1.0)),
                padding=int(p.get("padding", 0)), symmetric=True))
            total += float(p["weight"]) * mi
            metrics["mi"] = mi
        if "rr" in self._tiny:
            p = self._tiny["rr"]
            rr = per_subhead(lambda d1, d2: redundancy_criterion(
                d1, d2, alpha=float(p["alpha"]),
                lamda=float(p.get("lamda", 1.0)),
                symmetric=bool(p.get("symmetric", True))))
            total += float(p["weight"]) * rr
            metrics["rr"] = rr
            if self._save:
                _, joint = redundancy_criterion(
                    dist_tf[0], tf_dist[0], alpha=float(p["alpha"]),
                    lamda=float(p.get("lamda", 1.0)),
                    symmetric=bool(p.get("symmetric", True)),
                    return_joint=True)
                metrics["fig/joint_rr"] = joint
        if "imsat" in self._tiny:
            p = self._tiny["imsat"]
            w = state["imsat_weight"]

            def _imsat(d1, _):
                marg, cond = imsat_terms(d1)
                return -w * marg + cond, marg
            losses, margs = jax.vmap(_imsat)(dist_tf, tf_dist)
            im = losses.mean()
            total += float(p["weight"]) * im
            metrics["imsat"] = im
            metrics["imsat_weight"] = w
            if bool(p.get("use_dynamic", True)):
                K = self._num_clusters if not self._on_logits else dist_tf.shape[-1]
                increment = (math.log(K)
                             - jax.lax.stop_gradient(margs.mean())) * 0.01
                new_state["imsat_weight"] = w + increment
        if "consist" in self._tiny:
            p = self._tiny["consist"]
            cons = per_subhead(lambda d1, d2: kl_div(
                d1, jax.lax.stop_gradient(d2)))
            total += float(p["weight"]) * cons
            metrics["consist"] = cons
        return total, new_state, metrics


def create_cross_correlation_hook(*, feature_name: str, num_clusters: int,
                                  head_type: str = "mlp",
                                  num_subheads: int = 1, save: bool = False,
                                  hooks: t.Mapping, num_classes: int = 4,
                                  train_encoder: bool = True, **_ignored):
    """ref: semi_seg/hooks/creator.py:196-240 ``create_cross_correlation_hooks2``."""
    return CrossCorrelationHook(
        name=f"cc_{feature_name}", feature_name=feature_name,
        num_clusters=num_clusters, head_type=head_type,
        num_subheads=num_subheads, num_classes=num_classes, hooks=hooks,
        save=save)
