"""Fused supervised-contrastive (InfoNCE) loss as a Pallas TPU kernel.

The eager formulation (losses/contrastive.py) materializes three [2N, 2N]
f32 tensors in HBM (sim_logits, sim_exp, masked products). For the global
batches the data-parallel path produces (2N in the thousands after the
all-gather), this kernel streams row-blocks: each grid step computes one
[BLK, 2N] similarity tile on the MXU straight from VMEM-resident projections,
does the masked log-sum-exp and positive-pair reduction in registers, and
writes only a [2N] per-anchor loss vector. Backward is the analytic gradient
(one masked softmax + two matmuls) via custom VJP.

Numerics deliberately match ``sup_con_loss`` with a per-row stabilizer (the
reference subtracts the global max; row max is equivalent under exp shift).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _interpret() -> bool:
    """Run the kernels in pallas interpret mode off-TPU (CPU test platform)."""
    return jax.default_backend() == "cpu"


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _loss_kernel(z_ref, zt_ref, pos_ref, neg_ref, loss_ref, *, temperature):
    """One row-block: per-anchor SupCon loss over all columns."""
    s = jnp.dot(z_ref[:], zt_ref[:],
                preferred_element_type=jnp.float32) / temperature
    pos = pos_ref[:]
    neg = neg_ref[:]
    m = pos + neg
    neg_inf = jnp.float32(-1e30)
    s_masked = jnp.where(m > 0, s, neg_inf)
    row_max = jnp.max(s_masked, axis=1, keepdims=True)
    row_max = jnp.maximum(row_max, neg_inf * 0)  # rows with no mask -> 0
    e = jnp.where(m > 0, jnp.exp(s - row_max), 0.0)
    denom = e.sum(axis=1, keepdims=True)
    log_denom = jnp.log(denom + 1e-16) + row_max
    pos_count = pos.sum(axis=1)
    per_pair = (s - log_denom) * pos
    # the [G, BLK] output block is revisited by every grid step; each step
    # fills its own row
    loss_ref[pl.program_id(0), :] = (-per_pair.sum(axis=1)
                                     / jnp.maximum(pos_count, 1.0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_sup_con_loss(z: jnp.ndarray, pos_mask: jnp.ndarray,
                       neg_mask: jnp.ndarray, temperature: float = 0.07):
    """z: [M, d] L2-normalized stacked projections (both views); masks: [M, M]
    with diagonal already removed. Returns the scalar mean per-anchor loss."""
    return _forward(z, pos_mask, neg_mask, temperature)


def _forward(z, pos_mask, neg_mask, temperature):
    M, d = z.shape
    Mp = _round_up(M, BLK)
    dp = _round_up(d, 128)
    z_p = jnp.zeros((Mp, dp), jnp.float32).at[:M, :d].set(z.astype(jnp.float32))
    pos_p = jnp.zeros((Mp, Mp), jnp.float32).at[:M, :M].set(pos_mask)
    neg_p = jnp.zeros((Mp, Mp), jnp.float32).at[:M, :M].set(neg_mask)

    grid = (Mp // BLK,)
    loss_vec = pl.pallas_call(
        functools.partial(_loss_kernel, temperature=temperature),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),     # z row block
            pl.BlockSpec((dp, Mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),     # z.T full
            pl.BlockSpec((BLK, Mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, Mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp // BLK, BLK), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp // BLK, BLK), jnp.float32),
        interpret=_interpret(),
    )(z_p, z_p.T, pos_p, neg_p)
    return loss_vec.reshape(-1)[:M].mean()


def _fwd(z, pos_mask, neg_mask, temperature):
    return _forward(z, pos_mask, neg_mask, temperature), (z, pos_mask, neg_mask)


def _bwd_kernel(z_blk_ref, z_ref, pos_ref, neg_ref, dz_ref, *,
                temperature, m_total):
    """One row-block of the analytic gradient, STREAMING: recompute this
    block's masked softmax from VMEM-resident projections and accumulate both
    dz contributions (G @ z for the block's rows, G^T @ z_blk for all rows) —
    no [M, M] tensor ever reaches HBM."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dz_ref[:] = jnp.zeros_like(dz_ref)

    zb = z_blk_ref[:]                                      # [BLK, dp]
    zfull = z_ref[:]                                       # [Mp, dp]
    s = jax.lax.dot_general(zb, zfull, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) / temperature
    pos = pos_ref[:]
    neg = neg_ref[:]
    m = pos + neg
    s_masked = jnp.where(m > 0, s, jnp.float32(-1e30))
    row_max = jnp.max(s_masked, axis=1, keepdims=True)
    e = jnp.where(m > 0, jnp.exp(s - row_max), 0.0)
    p = e / jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    pos_count = jnp.maximum(pos.sum(axis=1, keepdims=True), 1.0)
    a = pos / pos_count
    w = a.sum(axis=1, keepdims=True)
    G = -(a - w * p) / m_total                             # [BLK, Mp]

    # column (transpose) contribution touches every output row
    trans = jax.lax.dot_general(G, zb, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dz_ref[:] = dz_ref[:] + trans
    # row (direct) contribution lands on this block's rows only
    direct = jnp.dot(G, zfull, preferred_element_type=jnp.float32)
    blk = pl.dslice(i * G.shape[0], G.shape[0])
    dz_ref[blk, :] = dz_ref[blk, :] + direct


def _bwd(temperature, residuals, g):
    z, pos_mask, neg_mask = residuals
    M, d = z.shape
    Mp = _round_up(M, BLK)
    dp = _round_up(d, 128)
    z_p = jnp.zeros((Mp, dp), jnp.float32).at[:M, :d].set(z.astype(jnp.float32))
    pos_p = jnp.zeros((Mp, Mp), jnp.float32).at[:M, :M].set(pos_mask)
    neg_p = jnp.zeros((Mp, Mp), jnp.float32).at[:M, :M].set(neg_mask)

    grid = (Mp // BLK,)
    dz_p = pl.pallas_call(
        functools.partial(_bwd_kernel, temperature=temperature, m_total=M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),     # z row block
            pl.BlockSpec((Mp, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),     # z full
            pl.BlockSpec((BLK, Mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, Mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, dp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, dp), jnp.float32),
        interpret=_interpret(),
    )(z_p, z_p, pos_p, neg_p)
    dz = dz_p[:M, :d] / temperature * g
    return dz.astype(z.dtype), None, None


fused_sup_con_loss.defvjp(_fwd, _bwd)
