"""Projection / cluster heads for contrastive and MI objectives.

Capability match for contrastyou/projectors/heads.py:12-200 and nn.py:8-86:
- ``ProjectionHead``: pooled global embedding -> (linear | mlp) -> optional L2
  normalize (for encoder InfoNCE);
- ``DenseProjectionHead``: 1x1-conv (linear | mlp) -> adaptive pool to a fixed
  grid -> optional normalize (for decoder dense InfoNCE);
- ``ClusterHead`` / ``DenseClusterHead``: multi-subhead temperature-softmax
  cluster distributions (for IIC / discrete MI);
- ``CrossCorrelationProjector``: dense multi-subhead distribution head.

TPU-native design: subheads are vmapped over a leading subhead axis — one
batched matmul/conv on the MXU instead of a Python list of tiny modules; heads
return stacked ``[S, ...]`` arrays rather than lists.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pooling import adaptive_avg_pool2d, adaptive_max_pool2d

__all__ = ["ProjectionHead", "DenseProjectionHead", "ClusterHead",
           "DenseClusterHead", "CrossCorrelationProjector"]


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # rsqrt(max(sum(x^2), eps^2)) instead of x/max(norm, eps): the norm form
    # has a NaN GRADIENT at x == 0 (d sqrt at 0), which poisons params the
    # moment any projected row is exactly zero (e.g. a dead-ReLU feature tile)
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def _pool(x, pool_name: str, spatial_size: Tuple[int, int]):
    if pool_name == "adaptive_avg":
        # bf16 inputs accumulate their spatial means in f32 INSIDE the
        # reduction (no materialized upcast copy — see adaptive_avg_pool2d)
        accum = jnp.float32 if x.dtype == jnp.bfloat16 else None
        return adaptive_avg_pool2d(x, spatial_size, accum_dtype=accum)
    if pool_name == "adaptive_max":
        # max needs no accumulation; order statistics are dtype-exact
        return adaptive_max_pool2d(x, spatial_size)
    if pool_name == "none":
        return x
    raise ValueError(pool_name)


class ProjectionHead(nn.Module):
    """Global pooled MLP projector (ref: heads.py:82-100)."""
    output_dim: int = 256
    hidden_dim: int = 256
    head_type: str = "mlp"  # "mlp" | "linear"
    normalize: bool = True
    pool_name: str = "adaptive_avg"
    spatial_size: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        x = _pool(features, self.pool_name, self.spatial_size)
        x = x.reshape(x.shape[0], -1)
        if self.head_type == "mlp":
            x = nn.Dense(self.hidden_dim)(x)
            x = nn.leaky_relu(x, 0.01)
        x = nn.Dense(self.output_dim)(x)
        return l2_normalize(x) if self.normalize else x


class DenseProjectionHead(nn.Module):
    """Pixel-wise projector: 1x1 convs then pool to a coarse grid
    (ref: heads.py:104-127)."""
    output_dim: int = 256
    hidden_dim: int = 128
    head_type: str = "mlp"
    normalize: bool = True
    pool_name: str = "adaptive_avg"
    spatial_size: Tuple[int, int] = (16, 16)

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        from ..perf import get as perf_knob
        x = features
        # bf16 compute for the full-resolution 1x1 convs (f32 params, bf16
        # dot with f32 accumulation — the model-wide policy): at the
        # decoder-pretrain shape the f32 [96,224,224,256] hidden/output
        # activations and their convs were 67.5 ms of the 458 ms step (r5
        # trace). Auto = TPU only, so the CPU golden-parity suites keep
        # f32; pooling and l2-normalize stay f32 below either way.
        # CONTRASTYOU_PROJ_BF16: "" auto (TPU), "1" force, "0" off.
        raw = perf_knob("PROJ_BF16")
        bf16 = (features.dtype == jnp.bfloat16 and raw != "0"
                and (raw == "1" or jax.default_backend() == "tpu"))
        cdt = jnp.bfloat16 if bf16 else None
        if self.head_type == "mlp":
            x = nn.Conv(self.hidden_dim, (1, 1), dtype=cdt)(x)
            x = nn.leaky_relu(x, 0.01)
        # A 1x1 conv is a pure per-pixel channel map, and adaptive AVERAGE
        # pooling is a linear spatial mean, so they commute exactly in real
        # arithmetic: pool(Wx + b) == W pool(x) + b.  Round-5 on-chip A/B
        # (tools/scripts_perf_pretrain.py decoder, 2x2 interleaved): the
        # commute MEASURES WORSE — 462.4 vs 458.4-458.6 ms/step — because
        # only the small output conv moves; the full-res hidden conv +
        # ReLU (non-commutable) dominates the head, and pooling early
        # costs XLA a fusion.  Default OFF = the reference operation order
        # (ref: contrastyou/projectors/heads.py:104-127 convs-then-pool);
        # CONTRASTYOU_POOL_EARLY=1 opts in (exact commute, equivalence:
        # tests/test_models.py).
        # "" auto follows the compute dtype: in the f32 world the commute
        # measured worse (462.4 vs 458.4 r5 A/B — it costs a fusion), but
        # under PROJ_BF16 it deletes the full-res output conv and its
        # backward outright (decoder-pretrain 273.7 -> 268.7 ms) — each
        # world keeps its measured winner.
        raw_early = perf_knob("POOL_EARLY")
        early = (self.pool_name == "adaptive_avg"
                 and (raw_early == "1" or (raw_early == "" and bf16)))
        # bf16 inputs never accumulate the up-to-196-element spatial means
        # in bf16 (advisor r4): _pool runs the mean with f32 accumulation
        # INSIDE the reduction fusion (no materialized upcast copy).
        if early:
            x = _pool(x, self.pool_name, self.spatial_size)
        x = nn.Conv(self.output_dim, (1, 1), dtype=cdt)(x)
        if not early:
            x = _pool(x, self.pool_name, self.spatial_size)
        x = x.astype(jnp.float32)
        return l2_normalize(x, axis=-1) if self.normalize else x


class _SubHead(nn.Module):
    """One cluster subhead: pooled (linear|mlp) -> softmax with temperature."""
    num_clusters: int
    head_type: str
    normalize: bool
    T: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.head_type == "mlp":
            x = nn.Dense(128)(x)
            x = nn.leaky_relu(x, 0.01)
        x = nn.Dense(self.num_clusters)(x)
        if self.normalize:
            x = l2_normalize(x)
        return nn.softmax(x / self.T, axis=-1)


class ClusterHead(nn.Module):
    """Multi-subhead global cluster distributions -> [S, B, K]
    (ref: heads.py:131-156)."""
    num_clusters: int = 5
    num_subheads: int = 10
    head_type: str = "linear"
    T: float = 1.0
    normalize: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        x = adaptive_avg_pool2d(features, (1, 1)).reshape(features.shape[0], -1)
        Vmapped = nn.vmap(_SubHead, in_axes=None, out_axes=0,
                          axis_size=self.num_subheads,
                          variable_axes={"params": 0},
                          split_rngs={"params": True})
        return Vmapped(self.num_clusters, self.head_type, self.normalize, self.T)(x)


class _DenseSubHead(nn.Module):
    num_clusters: int
    hidden_dim: int
    head_type: str
    normalize: bool
    T: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.head_type == "mlp":
            x = nn.Conv(self.hidden_dim, (1, 1))(x)
            x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(self.num_clusters, (1, 1))(x)
        if self.normalize:
            x = l2_normalize(x, axis=-1)
        return nn.softmax(x / self.T, axis=-1)


class DenseClusterHead(nn.Module):
    """Multi-subhead per-pixel cluster distributions -> [S, B, H, W, K]
    (ref: heads.py:160-181)."""
    num_clusters: int = 10
    hidden_dim: int = 64
    num_subheads: int = 10
    head_type: str = "linear"
    T: float = 1.0
    normalize: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        Vmapped = nn.vmap(_DenseSubHead, in_axes=None, out_axes=0,
                          axis_size=self.num_subheads,
                          variable_axes={"params": 0},
                          split_rngs={"params": True})
        return Vmapped(self.num_clusters, self.hidden_dim, self.head_type,
                       self.normalize, self.T)(features)


class CrossCorrelationProjector(DenseClusterHead):
    """Dense over-segmented distribution head used by the cross-correlation
    block (ref: heads.py:185-220); same structure as DenseClusterHead with
    hidden_dim 128 / 1 subhead defaults."""
    num_clusters: int = 20
    hidden_dim: int = 128
    num_subheads: int = 1
    head_type: str = "mlp"
    T: float = 1.0
    normalize: bool = False


def dense_cluster_probs_merged(params, features: jnp.ndarray, *,
                               num_subheads: int, num_clusters: int,
                               T: float = 1.0) -> jnp.ndarray:
    """MXU-merged apply of a LINEAR DenseClusterHead: consumes the vmapped
    param tree (``Vmap_DenseSubHead_0/Conv_0`` kernel [S,1,1,C,K], bias
    [S,K]) and computes ALL subheads in ONE [N, C] x [C, S*K] matmul,
    followed by a per-K-group softmax — returns [B, H, W, S*K].

    Why (round-3 udaiic profile): the vmapped per-subhead 1x1 convs put
    K=20 of 128 output lanes to work (x5 separate matmuls) and materialize
    [S, 2B, H, W, K] probabilities; the merged layout fills 100/128 lanes
    and keeps one [B, H, W, S*K] tensor that feeds the merged displacement
    joints (losses/discrete_mi.compute_joint_2d_merged) directly.
    Numerically identical to the module apply (same params, same math) —
    asserted by test_losses_merged."""
    conv = params["Vmap_DenseSubHead_0"]["Conv_0"]
    S, K = num_subheads, num_clusters
    kern = conv["kernel"]                        # [S, 1, 1, C, K]
    assert kern.shape[0] == S and kern.shape[-1] == K, kern.shape
    C = kern.shape[-2]
    w = jnp.transpose(kern.reshape(S, C, K), (1, 0, 2)).reshape(C, S * K)
    b = conv["bias"].reshape(S * K)
    logits = features @ w + b                    # [B, H, W, S*K]
    B, H, W, _ = logits.shape
    probs = jax.nn.softmax(logits.reshape(B, H, W, S, K) / T, axis=-1)
    return probs.reshape(B, H, W, S * K)
