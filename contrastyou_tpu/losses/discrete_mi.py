"""Discrete mutual-information losses: IIC (classification + segmentation),
IMSAT, and joint-distribution builders.

Capability match for contrastyou/losses/discreteMI.py:20-297, re-expressed for
channels-last jnp tensors:
- ``compute_joint``: k x k joint from two [N, K] simplexes;
- ``compute_joint_2d``: displacement-padded spatial joint [T, T, K, K] via one
  batched conv (MXU);
- ``compute_joint_2d_with_padding_zeros``: flattened matmul joint (a single
  [K, N] @ [N, K] contraction — maps straight onto the MXU);
- ``iid_loss`` / ``iid_segmentation_loss`` (+ patchwise variant) / ``imsat_loss``.
"""
from __future__ import annotations

import math
import sys
from typing import Optional, Tuple

import jax.numpy as jnp
import jax
from jax import lax

_EPS = sys.float_info.epsilon


def compute_joint(x_out: jnp.ndarray, x_tf_out: jnp.ndarray,
                  symmetric: bool = True) -> jnp.ndarray:
    """[N, K] x [N, K] -> [K, K] normalized joint (ref: discreteMI.py:201-222)."""
    p_i_j = x_out.T @ x_tf_out  # sum_n p1[n,i] p2[n,j]
    if symmetric:
        p_i_j = (p_i_j + p_i_j.T) / 2.0
    return p_i_j / p_i_j.sum()


def compute_joint_2d(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, *,
                     symmetric: bool = True, padding: int = 0) -> jnp.ndarray:
    """Spatial joint with displacement window: [B, H, W, K] inputs ->
    [T, T, K, K], T = 2*padding+1 (ref: discreteMI.py:225-243).

    One [K, N] x [N, K] MXU contraction per displacement over a shifted
    zero-padded view (XLA fuses the slices). The mathematically equivalent
    image-sized-kernel conv formulation ran ~40x slower on the TPU backend
    (a 224x224-kernel conv is a pathological XLA shape — BENCH_NOTES)."""
    p = int(padding)
    H, W = x_tf_out.shape[1], x_tf_out.shape[2]
    xo = jnp.pad(x_out, ((0, 0), (p, p), (p, p), (0, 0)))
    t = 2 * p + 1
    joint = jnp.stack([
        jnp.stack([
            jnp.einsum("bhwi,bhwj->ij",
                       lax.slice(xo, (0, ty, tx, 0),
                                 (xo.shape[0], ty + H, tx + W, xo.shape[3])),
                       x_tf_out, preferred_element_type=jnp.float32)
            for tx in range(t)])
        for ty in range(t)])                      # T, T, K, K
    joint = joint - lax.stop_gradient(joint.min()) + 1e-8
    joint = joint / joint.sum(axis=(2, 3), keepdims=True)
    if symmetric:
        joint = (joint + jnp.transpose(joint, (0, 1, 3, 2))) / 2.0
    return joint / joint.sum()


def compute_joint_2d_with_padding_zeros(x_out: jnp.ndarray, x_tf_out: jnp.ndarray,
                                        *, symmetric: bool = True) -> jnp.ndarray:
    """Zero-displacement spatial joint as one flattened matmul: [B, H, W, K]
    inputs -> [1, 1, K, K] (ref: discreteMI.py:246-263). NOT normalized —
    consistent with the reference, which divides by N via the sqrt(N) factors."""
    k = x_out.shape[-1]
    a = x_out.reshape(-1, k)
    b = x_tf_out.reshape(-1, k)
    n = a.shape[0]
    p_i_j = (a.T / math.sqrt(n)) @ (b / math.sqrt(n))
    if symmetric:
        p_i_j = (p_i_j + p_i_j.T) / 2.0
    return p_i_j.reshape(1, 1, k, k)


def iid_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, lamb: float = 1.0
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """IIC clustering loss over [N, K] simplexes
    (ref: discreteMI.py:90-125). Returns (loss, loss_no_lamb, joint)."""
    k = x_out.shape[-1]
    p_i_j = compute_joint(x_out, x_tf_out)
    p_i = p_i_j.sum(axis=1).reshape(k, 1)
    p_j = p_i_j.sum(axis=0).reshape(1, k)

    def _mi(lam):
        return (-p_i_j * (jnp.log(p_i_j + 1e-10)
                          - lam * jnp.log(p_j + 1e-10)
                          - lam * jnp.log(p_i + 1e-10))).sum()

    return _mi(lamb), _mi(1.0), p_i_j


def iid_segmentation_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, *,
                          lamda: float = 1.0, padding: int = 0,
                          eps: float = 1e-5, symmetric: bool = False,
                          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Spatial IIC over [B, H, W, K] simplexes (ref: discreteMI.py:127-171)."""
    if mask is not None:
        x_out = x_out * mask
        x_tf_out = x_tf_out * mask
    T = padding * 2 + 1
    if padding > 0:
        p_i_j = compute_joint_2d(x_out, x_tf_out, symmetric=symmetric,
                                 padding=padding)
    else:
        p_i_j = compute_joint_2d_with_padding_zeros(x_out, x_tf_out,
                                                    symmetric=symmetric)
    p_i_mat = p_i_j.sum(axis=2, keepdims=True)
    p_j_mat = p_i_j.sum(axis=3, keepdims=True)
    loss = -p_i_j * (jnp.log(p_i_j + eps)
                     - lamda * jnp.log(p_i_mat + eps)
                     - lamda * jnp.log(p_j_mat + eps))
    return loss.sum() / (T * T)


def _patch_slices(size: int, patch: int, step: int):
    starts = list(range(0, max(size - patch, 0), step)) or [0]
    last = max(size - patch, 0)
    if starts[-1] != last:
        starts.append(last)
    return starts


def iid_segmentation_small_path_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, *,
                                     lamda: float = 1.0, padding: int = 7,
                                     patch_size: int = 32,
                                     mask: Optional[jnp.ndarray] = None
                                     ) -> jnp.ndarray:
    """Patchwise spatial IIC (ref: discreteMI.py:173-198): average the loss over
    overlapping patches (stride = patch/2). Patch starts are static."""
    _, H, W, _ = x_out.shape
    ph = pw = min(patch_size, H, W)
    losses = []
    for h0 in _patch_slices(H, ph, max(ph // 2, 1)):
        for w0 in _patch_slices(W, pw, max(pw // 2, 1)):
            sl = (slice(None), slice(h0, h0 + ph), slice(w0, w0 + pw))
            m = mask[sl] if mask is not None else None
            losses.append(iid_segmentation_loss(
                x_out[sl], x_tf_out[sl], lamda=lamda, padding=padding,
                eps=_EPS, mask=m))
    return sum(losses) / len(losses)


def _row_entropy(p: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return -(p * jnp.log(p + eps)).sum(axis=-1)


def imsat_terms(prediction: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(marginal_entropy, mean_conditional_entropy) of [..., K] simplexes
    (ref: discreteMI.py:288-297 ``imsat_with_entropy``)."""
    pred = prediction.reshape(-1, prediction.shape[-1])
    marginal = _row_entropy(pred.mean(axis=0))
    conditional = _row_entropy(pred).mean()
    return marginal, conditional


def imsat_loss(prediction: jnp.ndarray, lamda: float = 1.0) -> jnp.ndarray:
    """-MI = mean conditional entropy - lamda * marginal entropy
    (ref: discreteMI.py:275-285)."""
    marginal, conditional = imsat_terms(prediction)
    return conditional - lamda * marginal


class IIDLoss:
    def __init__(self, lamb: float = 1.0):
        self._lamb = lamb

    def __call__(self, x_out, x_tf_out):
        return iid_loss(x_out, x_tf_out, lamb=self._lamb)


class IIDSegmentationLoss:
    def __init__(self, lamda: float = 1.0, padding: int = 0, eps: float = 1e-5,
                 symmetric: bool = False):
        self._kw = dict(lamda=lamda, padding=padding, eps=eps, symmetric=symmetric)

    def __call__(self, x_out, x_tf_out, mask=None):
        return iid_segmentation_loss(x_out, x_tf_out, mask=mask, **self._kw)


class IIDSegmentationSmallPathLoss:
    def __init__(self, lamda: float = 1.0, padding: int = 7, patch_size: int = 32):
        self._kw = dict(lamda=lamda, padding=padding, patch_size=patch_size)

    def __call__(self, x_out, x_tf_out, mask=None):
        return iid_segmentation_small_path_loss(x_out, x_tf_out, mask=mask, **self._kw)


class IMSATLoss:
    """Symmetrized IMSAT over one or two views (ref: discreteMI.py:20-53)."""

    def __init__(self, lamda: float = 1.0):
        self._lamda = lamda

    def __call__(self, x_out, x_tf_out=None):
        if x_tf_out is None:
            return imsat_loss(x_out, lamda=self._lamda)
        return 0.5 * (imsat_loss(x_out, lamda=self._lamda)
                      + imsat_loss(x_tf_out, lamda=self._lamda))


def _merged_displacement_joints(p1m: jnp.ndarray, p2m: jnp.ndarray,
                                S: int, K: int, padding: int) -> jnp.ndarray:
    """Merged-subhead displacement joints: [B,H,W,S*K] groupwise simplex
    pair -> raw per-subhead joints [S, T, T, K, K].

    One [S*K, N] x [N, S*K] MXU contraction per displacement (slices of the
    once-padded view fuse into the matmul; nothing shifted is materialized)
    — 100/128 output lanes at the reference's S=5, K=20 vs 20/128 for the
    per-subhead form. The off-diagonal S x S blocks are discarded: ~S x
    FLOP overhead that measured far cheaper than running S narrow matmuls
    (round-3 udaiic profile; BENCH_NOTES)."""
    p = int(padding)
    t = 2 * p + 1
    B, H, W, _ = p2m.shape
    xo = jnp.pad(p1m, ((0, 0), (p, p), (p, p), (0, 0)))
    rows = []
    diag = jnp.arange(S)
    for ty in range(t):
        cols = []
        for tx in range(t):
            sl = lax.slice(xo, (0, ty, tx, 0),
                           (B, ty + H, tx + W, S * K))
            m = jnp.einsum("bhwi,bhwj->ij", sl, p2m,
                           preferred_element_type=jnp.float32)
            m4 = m.reshape(S, K, S, K)
            cols.append(m4[diag, :, diag, :])     # [S, K, K] diagonal blocks
        rows.append(jnp.stack(cols))              # [T, S, K, K]
    joint = jnp.stack(rows)                       # [T, T, S, K, K]
    return jnp.transpose(joint, (2, 0, 1, 3, 4))  # [S, T, T, K, K]


def iid_loss_from_raw_joints(raw: jnp.ndarray, *, padding: int, count: int,
                             lamda: float = 1.0, eps: float = 1e-5,
                             symmetric: bool = False) -> jnp.ndarray:
    """Per-subhead IIC losses [S] from RAW (unnormalized) displacement
    joints [S, T, T, K, K] — the shared tail of the merged XLA path and
    the fused Pallas kernel (ops/pallas/iic.py). ``count`` = number of
    pixel pairs per displacement (B*H*W; only used for padding == 0, where
    the merged path normalizes by 1/n instead of the min-shift chain)."""
    T = padding * 2 + 1
    if padding > 0:
        def normalize(j):
            j = j - lax.stop_gradient(j.min()) + 1e-8
            j = j / j.sum(axis=(2, 3), keepdims=True)
            if symmetric:
                j = (j + jnp.transpose(j, (0, 1, 3, 2))) / 2.0
            return j / j.sum()

        p_i_j = jax.vmap(normalize)(raw)
    else:
        p_i_j = raw[:, 0, 0] / count
        if symmetric:
            p_i_j = (p_i_j + jnp.transpose(p_i_j, (0, 2, 1))) / 2.0
        p_i_j = p_i_j[:, None, None]              # [S, 1, 1, K, K]

    def tail(j):
        p_i_mat = j.sum(axis=2, keepdims=True)
        p_j_mat = j.sum(axis=3, keepdims=True)
        loss = -j * (jnp.log(j + eps)
                     - lamda * jnp.log(p_i_mat + eps)
                     - lamda * jnp.log(p_j_mat + eps))
        return loss.sum() / (T * T)

    return jax.vmap(tail)(p_i_j)


def iid_segmentation_loss_merged(p1m: jnp.ndarray, p2m: jnp.ndarray, *,
                                 num_subheads: int, num_clusters: int,
                                 lamda: float = 1.0, padding: int = 0,
                                 eps: float = 1e-5, symmetric: bool = False
                                 ) -> jnp.ndarray:
    """Per-subhead spatial IIC losses [S] from MERGED probability maps
    [B, H, W, S*K] — numerically identical to
    ``vmap(iid_segmentation_loss)`` over the [S, B, H, W, K] form (same
    joints, same normalization; asserted by test_losses_merged), computed
    through MXU-efficient merged contractions."""
    S, K = num_subheads, num_clusters
    B, H, W, _ = p1m.shape
    n = B * H * W
    if padding > 0:
        raw = _merged_displacement_joints(p1m, p2m, S, K, padding)
    else:
        a = p1m.reshape(n, S * K) / math.sqrt(n)
        b = p2m.reshape(n, S * K) / math.sqrt(n)
        m = jnp.einsum("ni,nj->ij", a, b, preferred_element_type=jnp.float32)
        m4 = m.reshape(S, K, S, K)
        diag = jnp.arange(S)
        raw = m4[diag, :, diag, :][:, None, None]  # already /n
    return iid_loss_from_raw_joints(raw, padding=padding,
                                    count=1 if padding == 0 else n,
                                    lamda=lamda, eps=eps, symmetric=symmetric)
