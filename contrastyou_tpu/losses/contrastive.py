"""Supervised-contrastive (InfoNCE) and self-paced variants.

Capability match for contrastyou/losses/contrastive.py:23-212:
- ``sup_con_loss``: 2N x 2N similarity matrix over two normalized views with
  positive/negative masks derived from labels (or identity for SimCLR),
  max-subtracted exp stabilization, optional ``exclude_other_pos``;
- ``self_paced_sup_con_loss``: per-pair self-paced weights (hard/soft) from an
  age parameter gamma, downgrade-ratio metric, optional grad correction.

TPU notes: the core is one [2N, d] x [d, 2N] matmul (MXU) + masked
log-sum-exp; gamma is a traced scalar so epoch-ramped schedules don't retrace.
The fused Pallas path (ops/pallas/infonce.py) plugs in under the same API at
small anchor counts, where it measured 1.2-1.9x on-chip (see
FUSED_MAX_ANCHORS). Aux tensors (sim logits, masks) are returned for TB visualization
instead of being stashed on the loss object.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax


def pair_masks_from_target(target: Optional[jnp.ndarray], batch_size: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(pos_mask, neg_mask) [N, N] from integer labels; identity masks when
    target is None (SimCLR)."""
    if target is None:
        pos = jnp.eye(batch_size, dtype=jnp.float32)
        return pos, 1.0 - pos
    target = jnp.asarray(target)
    eq = (target[:, None] == target[None, :])
    return eq.astype(jnp.float32), (~eq).astype(jnp.float32)


def _sim_exp(f1: jnp.ndarray, f2: jnp.ndarray, t: float):
    z = jnp.concatenate([f1, f2], axis=0)
    sim_logits = (z @ z.T) / t
    sim_logits = sim_logits - lax.stop_gradient(sim_logits.max())
    return jnp.exp(sim_logits), sim_logits


def _expand_masks(pos_mask, neg_mask, n: int):
    pos = jnp.tile(pos_mask, (2, 2))
    neg = jnp.tile(neg_mask, (2, 2))
    off_diag = 1.0 - jnp.eye(2 * n, dtype=pos.dtype)
    return pos * off_diag, neg * off_diag


#: anchors <= this threshold route through the fused Pallas kernel on TPU.
#: On-chip A/B (tools/scripts_perf_supcon.py, value+grad, donated chained
#: state): fused wins at SMALL anchor counts — 1.87x at 2N=100 (the
#: production contrastive batch, PRETRAIN_BATCH_SIZE_MAX=50) and 1.24x at
#: 2N=256 — while the eager single-matmul path wins in the 512..2048 band
#: (0.68-0.91x) and the fused backward VMEM-OOMs at 2N=8192. The original
#: ">= 512" gate had the crossover inverted and never fired in production.
FUSED_MAX_ANCHORS = 256


def _tpu_backend() -> bool:
    import jax
    return jax.default_backend() not in ("cpu",)


def sup_con_loss(proj_feat1: jnp.ndarray, proj_feat2: jnp.ndarray, *,
                 target: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 temperature: float = 0.07, exclude_other_pos: bool = False,
                 return_aux: bool = False, fused: Optional[bool] = None):
    """proj_feat{1,2}: [N, d], L2-normalized. Returns scalar loss
    (+ aux dict when return_aux). ``fused`` selects the Pallas streaming
    kernel (ops/pallas/infonce.py); default: auto on TPU for small anchor
    counts (2N <= FUSED_MAX_ANCHORS), where it measured faster on-chip."""
    n = proj_feat1.shape[0]
    if mask is not None:
        pos_mask = (mask == 1).astype(jnp.float32)
        neg_mask = (mask == 0).astype(jnp.float32)
    else:
        pos_mask, neg_mask = pair_masks_from_target(target, n)
    pos_mask, neg_mask = _expand_masks(pos_mask, neg_mask, n)

    if fused is None:
        fused = (2 * n <= FUSED_MAX_ANCHORS and not return_aux
                 and not exclude_other_pos and _tpu_backend())
    if fused:
        from ..ops.pallas import fused_sup_con_loss
        z = jnp.concatenate([proj_feat1, proj_feat2], axis=0)
        return fused_sup_con_loss(z, pos_mask, neg_mask, temperature)

    sim_exp, sim_logits = _sim_exp(proj_feat1, proj_feat2, temperature)
    pos_count = pos_mask.sum(1)
    neg_count = neg_mask.sum(1)
    pos_sum = (sim_exp * pos_mask).sum(1, keepdims=True)
    neg_sum = (sim_exp * neg_mask).sum(1, keepdims=True)
    if exclude_other_pos:
        neg_ratio = neg_count / (pos_count + neg_count)
        log_frac = sim_logits - jnp.log(
            sim_exp + neg_sum / (neg_ratio + 1e-4)[:, None] + 1e-16)
    else:
        log_frac = sim_logits - jnp.log(pos_sum + neg_sum + 1e-16)

    per_anchor = (log_frac * pos_mask).sum(1) / jnp.maximum(pos_count, 1.0)
    loss = -per_anchor.mean()
    if return_aux:
        return loss, {"sim_logits": sim_logits, "sim_exp": sim_exp,
                      "pos_mask": pos_mask, "neg_mask": neg_mask}
    return loss


def self_paced_sup_con_loss(proj_feat1: jnp.ndarray, proj_feat2: jnp.ndarray, *,
                            gamma, target: Optional[jnp.ndarray] = None,
                            mask: Optional[jnp.ndarray] = None,
                            temperature: float = 0.07,
                            weight_update: str = "hard",
                            correct_grad: bool = False,
                            return_aux: bool = False):
    """Self-paced SupCon (ref: contrastive.py:103-212): per-pair loss
    l_ij = -log-frac; weight = 1{l<=gamma} (hard) or max(1 - l/gamma, 0)
    (soft), applied only on positive pairs. gamma may be a traced scalar.

    Returns (loss, metrics) where metrics includes ``downgrade_ratio``
    (mean weight over positive pairs)."""
    assert weight_update in ("hard", "soft"), weight_update
    n = proj_feat1.shape[0]
    if mask is not None:
        pos_mask = (mask == 1).astype(jnp.float32)
        neg_mask = (mask == 0).astype(jnp.float32)
    else:
        pos_mask, neg_mask = pair_masks_from_target(target, n)
    pos_mask, neg_mask = _expand_masks(pos_mask, neg_mask, n)

    sim_exp, sim_logits = _sim_exp(proj_feat1, proj_feat2, temperature)
    pos_count = pos_mask.sum(1)
    pos_sum = (sim_exp * pos_mask).sum(1, keepdims=True)
    neg_sum = (sim_exp * neg_mask).sum(1, keepdims=True)
    log_frac = sim_logits - jnp.log(pos_sum + neg_sum + 1e-16)

    l_ij = -log_frac
    if weight_update == "hard":
        weight = (l_ij <= gamma).astype(jnp.float32)
    else:
        weight = jnp.maximum(1.0 - l_ij / gamma, 0.0)
    sp_mask = lax.stop_gradient(jnp.maximum(weight, 1.0 - pos_mask))
    pos_total = jnp.maximum(pos_mask.sum(), 1.0)
    downgrade_ratio = (sp_mask * pos_mask).sum() / pos_total

    weighted = log_frac * sp_mask
    per_anchor = (weighted * pos_mask).sum(1) / jnp.maximum(pos_count, 1.0)
    loss = -per_anchor.mean()
    if correct_grad:
        loss = jnp.where(downgrade_ratio > 0, loss / downgrade_ratio, loss)
    metrics = {"downgrade_ratio": downgrade_ratio}
    if return_aux:
        metrics.update({"sim_logits": sim_logits, "pos_mask": pos_mask,
                        "sp_mask": sp_mask})
    return loss, metrics


class SupConLoss:
    def __init__(self, temperature: float = 0.07, exclude_other_pos: bool = False):
        self._t, self._exclude = temperature, exclude_other_pos

    def __call__(self, proj_feat1, proj_feat2, target=None, mask=None):
        return sup_con_loss(proj_feat1, proj_feat2, target=target, mask=mask,
                            temperature=self._t,
                            exclude_other_pos=self._exclude)


class SelfPacedSupConLoss:
    """Stateful wrapper holding gamma (set per epoch by the scheduler hook)."""

    def __init__(self, temperature: float = 0.07, weight_update: str = "hard",
                 correct_grad: bool = False):
        self._t = temperature
        self._weight_update = weight_update
        self._correct_grad = correct_grad
        self._gamma = 1e6

    def set_gamma(self, gamma: float) -> None:
        self._gamma = float(gamma)

    @property
    def age_param(self):
        return self._gamma

    def __call__(self, proj_feat1, proj_feat2, target=None, mask=None, gamma=None):
        return self_paced_sup_con_loss(
            proj_feat1, proj_feat2, target=target, mask=mask,
            gamma=self._gamma if gamma is None else gamma,
            temperature=self._t, weight_update=self._weight_update,
            correct_grad=self._correct_grad)
