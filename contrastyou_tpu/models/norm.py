"""MXU-reduction BatchNorm — a drop-in for ``flax.linen.BatchNorm``.

Motivation (round-2 profile, BENCH_NOTES.md): on this TPU backend the
BN statistic/backward reductions lower to ``convert_reduce`` fusions that run
~20x off the bandwidth roofline on [B,224,224,32] activations (XLA assigns a
(8 sublane x 128 lane) = (batch x channel) tiling where batch=10 pads to 16
and C=32 pads to 128 — 6.4x wasted bytes per pass). This module computes
every batch reduction as a **matrix product on the MXU** instead:

- sum(x)      = dot(ones[B,H,W], x)                       -> [C]
- sum(x*x)    = diag(dot_general(x, x, contract B,H,W))   -> [C,C] Gram, exact
  bf16*bf16 products accumulated in f32 (a bf16 product is exactly
  representable in f32 — higher precision than squaring in bf16 first)
- backward:   dbias = dot(ones, g); dscale = diag(dot_general(g, xhat))

The variable tree matches flax BatchNorm exactly (params {scale, bias},
batch_stats {mean, var}; ``momentum`` is the flax decay convention), so
checkpoints and reference weight-porting are unaffected.
"""
from __future__ import annotations

import os
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
from ..perf import get as perf_knob

__all__ = ["MXUBatchNorm", "use_mxu_bn"]


def use_mxu_bn(features: int | None = None) -> bool:
    """Env-gated selection so the two implementations can be A/B benched.

    ``CONTRASTYOU_MXU_BN=1`` uses MXU reductions everywhere; an integer > 1
    uses them only for layers with ``features`` <= that value (the Gram-diag
    trick wastes C^2 MXU work, so it only pays where XLA's convert_reduce is
    pathological — the wide-spatial small-C layers)."""
    raw = perf_knob("MXU_BN")
    try:
        val = int(raw)
    except ValueError:
        return False
    if val <= 0:
        return False
    if val == 1 or features is None:
        return True
    return features <= val


def _batch_dims(x):
    return tuple(range(x.ndim - 1))


def _sum_to_c(x) -> jnp.ndarray:
    """sum over all leading dims -> f32 [C], as an MXU dot with ones."""
    dims = _batch_dims(x)
    ones = jnp.ones(x.shape[:-1], x.dtype)
    return jax.lax.dot_general(ones, x, ((dims, dims), ((), ())),
                               preferred_element_type=jnp.float32)


def _gram_diag(a, b) -> jnp.ndarray:
    """diag(a^T b) contracting all leading dims -> f32 [C]."""
    dims = _batch_dims(a)
    gram = jax.lax.dot_general(a, b, ((dims, dims), ((), ())),
                               preferred_element_type=jnp.float32)
    return jnp.diagonal(gram)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train(x, scale, bias, eps):
    y, _, _ = _bn_train_fwd_impl(x, scale, bias, eps)
    return y


def _bn_train_fwd_impl(x, scale, bias, eps):
    n = 1
    for d in x.shape[:-1]:
        n *= d
    mean = _sum_to_c(x) / n                                  # f32 [C]
    ex2 = _gram_diag(x, x) / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                           # f32 [C]
    a = (scale * inv).astype(x.dtype)                        # fold into one FMA
    b = (bias - scale * inv * mean).astype(x.dtype)
    y = x * a + b
    return y, (mean, var), (inv,)


def _bn_train_fwd(x, scale, bias, eps):
    y, (mean, var), (inv,) = _bn_train_fwd_impl(x, scale, bias, eps)
    return y, (x, scale, mean, inv)


def _bn_train_bwd(eps, res, g):
    x, scale, mean, inv = res
    n = 1
    for d in x.shape[:-1]:
        n *= d
    xhat = (x.astype(jnp.float32) - mean) * inv              # recompute
    xhat = xhat.astype(x.dtype)
    dbias = _sum_to_c(g)                                     # f32 [C]
    dscale = _gram_diag(g, xhat)                             # f32 [C]
    # dx = scale*inv * (g - dbias/n - xhat * dscale/n)
    coef = (scale * inv).astype(x.dtype)
    dx = coef * (g
                 - (dbias / n).astype(x.dtype)
                 - xhat * (dscale / n).astype(x.dtype))
    return dx, dscale, dbias


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class MXUBatchNorm(nn.Module):
    """flax-BatchNorm-compatible module with MXU-based batch reductions."""
    use_running_average: bool = False
    momentum: float = 0.99          # flax decay convention
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        x = x.astype(self.dtype)
        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = (scale * inv).astype(x.dtype)
            b = (bias - scale * inv * ra_mean.value).astype(x.dtype)
            return x * a + b

        y = _bn_train(x, scale, bias, self.epsilon)
        if not self.is_initializing():
            # recompute stats OUTSIDE the custom_vjp (cheap MXU dots; XLA
            # CSEs them with the forward's) for the running update
            n = 1
            for d in x.shape[:-1]:
                n *= d
            mean = _sum_to_c(jax.lax.stop_gradient(x)) / n
            ex2 = _gram_diag(jax.lax.stop_gradient(x),
                             jax.lax.stop_gradient(x)) / n
            var = jnp.maximum(ex2 - mean * mean, 0.0)
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y
