"""Fused dense-IIC joints kernel: DenseClusterHead projection + grouped
softmax + displacement-joint accumulation in ONE Pallas kernel.

Why (VERDICT r2 next #5; round-3 udaiic profile): the merged XLA path
(models/projectors.dense_cluster_probs_merged +
losses/discrete_mi._merged_displacement_joints) materializes the
[2B, H, W, S*K] f32 probability maps (~640 MB at the reference udaiic
shapes) and re-reads both maps once per displacement — the whole path is
memory-bound. This kernel computes the raw joints STRAIGHT from the tapped
features: per spatial chunk it projects [C, L] features to [S*Kp, L]
logits on the MXU, takes the per-subhead softmax in VMEM, and accumulates
one [S*Kp, S*Kp] joint contraction per displacement — the probability maps
never touch HBM. The custom VJP recomputes the softmaxes in-kernel and
emits df/dW/db the same way.

Semantics match losses/discrete_mi.iid_segmentation_loss_merged's raw
joints exactly (zero-padding displacement semantics via masked probs;
ref: contrastyou/losses/discreteMI.py:225-263
compute_joint_2D_with_padding_zeros). Equivalence:
tests/test_iic_kernel.py (interpret mode on CPU — how the default suite
covers it; tools/scripts_perf_iic.py is the on-chip A/B).

Layout notes:
- K is padded per subhead to Kp = ceil(K/8)*8 sublanes (8-aligned sublane
  slices); padded slots carry bias -1e9 so their softmax mass is exactly 0
  and the padded joint rows/cols are zero.
- the image is pre-chunked into ``nch`` row bands with one halo row per
  side (``_chunk_planes``) so each grid step's working set fits VMEM; the
  zero-padding displacement semantics come from per-chunk interior masks,
  NOT from the halo (each pixel is counted exactly once via the p2 mask).
- displacement shifts are static lane rolls of the in-VMEM probability
  block (offset dy*rs + dx, rs = W+2), like the plane-conv tap loads.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convblock import _interpret
from ...perf import get as perf_knob

#: VMEM budget for the live [S*Kp, Lc] f32 vectors of the backward kernel:
#: three softmax/cotangent scratches plus ~5 transient values the compiler
#: keeps on the Mosaic stack (rolled views, dot results). Measured: the
#: first cut at 3-scratch accounting OOMed at 21.7 MB scoped.
_LIVE_BUFFERS = 8
_SCRATCH_BUDGET = 11 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=None)
def pick_chunks(H: int, W: int, skp: int) -> Tuple[int, int]:
    """(nch, Lc): smallest divisor of H whose chunk buffer keeps the three
    [skp, Lc] f32 scratches under budget."""
    rs = W + 2
    for nch in range(1, H + 1):
        if H % nch:
            continue
        rh = H // nch
        Lc = _round_up((rh + 2) * rs, 128)
        if _LIVE_BUFFERS * skp * Lc * 4 <= _SCRATCH_BUDGET:
            return nch, Lc
    raise ValueError(f"no chunking fits VMEM for H={H} W={W} skp={skp}")


def _chunk_planes(f: jnp.ndarray, nch: int, Lc: int) -> jnp.ndarray:
    """NHWC [B, H, W, C] -> channel-sublane row-band planes
    [B, nch, C, Lc]; each band carries one halo row per side (overlapping
    slices — their VJP is the scatter-add back onto the flat features)."""
    B, H, W, C = f.shape
    rh = H // nch
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bands = jnp.stack(
        [lax.slice_in_dim(fp, c * rh, c * rh + rh + 2, axis=1)
         for c in range(nch)], axis=1)              # [B, nch, rh+2, W+2, C]
    bands = bands.transpose(0, 1, 4, 2, 3).reshape(
        B, nch, C, (rh + 2) * (W + 2))
    return jnp.pad(bands, ((0, 0), (0, 0), (0, 0),
                           (0, Lc - (rh + 2) * (W + 2))))


@lru_cache(maxsize=None)
def _chunk_masks(H: int, W: int, nch: int, Lc: int) -> np.ndarray:
    """[nch, 2, Lc] f32: mask 0 = real pixels of the band buffer (applied
    to the rolled view — halo rows count, global borders don't); mask 1 =
    the band's OWN rows only (applied to the unshifted view, so every
    pixel contributes to the joints exactly once)."""
    rh = H // nch
    rs = W + 2
    out = np.zeros((nch, 2, Lc), np.float32)
    for c in range(nch):
        for r in range(rh + 2):
            grow = c * rh + r                      # global padded row
            real = 1 <= grow <= H
            own = 1 <= r <= rh
            if not real:
                continue
            lo = r * rs + 1
            out[c, 0, lo:lo + W] = 1.0
            if own:
                out[c, 1, lo:lo + W] = 1.0
    return out


def _offsets(padding: int, rs: int) -> Tuple[int, ...]:
    p = int(padding)
    return tuple(dy * rs + dx
                 for dy in range(-p, p + 1) for dx in range(-p, p + 1))


def _pad_params(w: jnp.ndarray, b: jnp.ndarray, S: int, K: int, Kp: int,
                T: float):
    """[C, S*K] / [S*K] -> MXU layout [S*Kp, C] / [S*Kp, 1] with 1/T folded
    in and -1e9 bias on the padded cluster slots."""
    C = w.shape[0]
    w4 = w.reshape(C, S, K).transpose(1, 2, 0) / T       # [S, K, C]
    w4 = jnp.pad(w4, ((0, 0), (0, Kp - K), (0, 0)))
    b4 = jnp.pad(b.reshape(S, K) / T, ((0, 0), (0, Kp - K)),
                 constant_values=-1e9)
    return w4.reshape(S * Kp, C), b4.reshape(S * Kp, 1)


def _softmax_groups(z, S: int, Kp: int):
    """[S*Kp, L] logits -> grouped softmax (per consecutive Kp sublanes)."""
    outs = []
    for s in range(S):
        zg = lax.slice_in_dim(z, s * Kp, (s + 1) * Kp, axis=0)
        m = jnp.max(zg, axis=0, keepdims=True)
        e = jnp.exp(zg - m)
        outs.append(e / jnp.sum(e, axis=0, keepdims=True))
    return jnp.concatenate(outs, axis=0)


def _proj_probs(f_ref, w_ref, b_ref, mrow, S: int, Kp: int):
    """One band: [C, Lc] features -> masked probs [S*Kp, Lc] f32."""
    f = f_ref[0, 0].astype(jnp.float32)
    z = jax.lax.dot_general(w_ref[:], f, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = z + b_ref[:]
    return _softmax_groups(z, S, Kp) * mrow


def _fwd_kernel(f1_ref, f2_ref, w_ref, b_ref, m_ref, out_ref, p1, p2,
                *, offsets, S: int, Kp: int, Lc: int):
    bi, ci = pl.program_id(0), pl.program_id(1)
    p1[:] = _proj_probs(f1_ref, w_ref, b_ref, m_ref[0, 0, :][None], S, Kp)
    p2[:] = _proj_probs(f2_ref, w_ref, b_ref, m_ref[0, 1, :][None], S, Kp)

    @pl.when((bi == 0) & (ci == 0))
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for t, off in enumerate(offsets):
        p1t = pltpu.roll(p1[:], (-off) % Lc, 1)   # p1t[:, l] = p1[:, l+off]
        jt = jax.lax.dot_general(p1t, p2[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out_ref[t] += jt


def _dz_from_dp(dp, sm, mrow, S: int, Kp: int):
    """softmax+mask VJP: p = softmax(z)*m  =>  dz = m * s * (dp - <dp, s>)
    per Kp-group (the lane mask is constant per lane, so it rides outside
    the softmax jacobian)."""
    outs = []
    for s in range(S):
        dpg = lax.slice_in_dim(dp, s * Kp, (s + 1) * Kp, axis=0)
        sg = lax.slice_in_dim(sm, s * Kp, (s + 1) * Kp, axis=0)
        inner = jnp.sum(dpg * sg, axis=0, keepdims=True)
        outs.append(sg * (dpg - inner))
    return jnp.concatenate(outs, axis=0) * mrow


def _bwd_kernel(f1_ref, f2_ref, w_ref, b_ref, m_ref, jbar_ref,
                df1_ref, df2_ref, dw_ref, db_ref, s1, s2, dp,
                *, offsets, S: int, Kp: int, Lc: int):
    bi, ci = pl.program_id(0), pl.program_id(1)
    m0 = m_ref[0, 0, :][None]
    m1 = m_ref[0, 1, :][None]
    one = jnp.ones_like(m0)
    s1[:] = _proj_probs(f1_ref, w_ref, b_ref, one, S, Kp)   # raw softmax
    s2[:] = _proj_probs(f2_ref, w_ref, b_ref, one, S, Kp)

    @pl.when((bi == 0) & (ci == 0))
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    f1 = f1_ref[0, 0].astype(jnp.float32)
    f2 = f2_ref[0, 0].astype(jnp.float32)

    # view 2: dp2 = sum_t Jbar_t^T @ p1t  (accumulate in the dp scratch so
    # at most two [skp, Lc] transients are live per tap)
    for t, off in enumerate(offsets):
        p1t = pltpu.roll(s1[:] * m0, (-off) % Lc, 1)
        q = jax.lax.dot_general(jbar_ref[t], p1t, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        dp[:] = q if t == 0 else dp[:] + q
    dz2 = _dz_from_dp(dp[:], s2[:], m1, S, Kp)
    df2_ref[0, 0, :, :] = jax.lax.dot_general(
        w_ref[:], dz2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(df2_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(dz2, f2, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dz2, axis=1, keepdims=True)

    # view 1: dp1 = sum_t shift_{+off}(Jbar_t @ p2)  (shift(v)[l] = v[l-off])
    for t, off in enumerate(offsets):
        q = jax.lax.dot_general(jbar_ref[t], s2[:] * m1,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        q = pltpu.roll(q, off % Lc, 1)
        dp[:] = q if t == 0 else dp[:] + q
    dz1 = _dz_from_dp(dp[:], s1[:], m0, S, Kp)
    df1_ref[0, 0, :, :] = jax.lax.dot_general(
        w_ref[:], dz1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(df1_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(dz1, f1, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dz1, axis=1, keepdims=True)


def _band_spec(C, Lc):
    return pl.BlockSpec((1, 1, C, Lc), lambda bi, ci: (bi, ci, 0, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_joints(f1c, f2c, wp, bp, masks_key, S, Kp, padding, geom):
    """chunked planes [B, nch, C, Lc] x2 + padded params -> raw merged
    joints [TT, S*Kp, S*Kp] f32 (TT = (2*padding+1)^2)."""
    H, W, nch, Lc = geom
    B, _, C, _ = f1c.shape
    skp = S * Kp
    offs = _offsets(padding, W + 2)
    masks = jnp.asarray(_chunk_masks(H, W, nch, Lc))
    kern = partial(_fwd_kernel, offsets=offs, S=S, Kp=Kp, Lc=Lc)
    return pl.pallas_call(
        kern,
        grid=(B, nch),
        in_specs=[
            _band_spec(C, Lc), _band_spec(C, Lc),
            pl.BlockSpec((skp, C), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((skp, 1), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Lc), lambda bi, ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((len(offs), skp, skp),
                               lambda bi, ci: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((len(offs), skp, skp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((skp, Lc), jnp.float32),
                        pltpu.VMEM((skp, Lc), jnp.float32)],
        interpret=_interpret(),
    )(f1c, f2c, wp, bp, masks)


def _fj_fwd(f1c, f2c, wp, bp, masks_key, S, Kp, padding, geom):
    out = _fused_joints(f1c, f2c, wp, bp, masks_key, S, Kp, padding, geom)
    return out, (f1c, f2c, wp, bp)


def _fj_bwd(masks_key, S, Kp, padding, geom, res, jbar):
    f1c, f2c, wp, bp = res
    H, W, nch, Lc = geom
    B, _, C, _ = f1c.shape
    skp = S * Kp
    offs = _offsets(padding, W + 2)
    masks = jnp.asarray(_chunk_masks(H, W, nch, Lc))
    kern = partial(_bwd_kernel, offsets=offs, S=S, Kp=Kp, Lc=Lc)
    df1, df2, dw, db = pl.pallas_call(
        kern,
        grid=(B, nch),
        in_specs=[
            _band_spec(C, Lc), _band_spec(C, Lc),
            pl.BlockSpec((skp, C), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((skp, 1), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Lc), lambda bi, ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(offs), skp, skp), lambda bi, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            _band_spec(C, Lc), _band_spec(C, Lc),
            pl.BlockSpec((skp, C), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((skp, 1), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(f1c.shape, f1c.dtype),
            jax.ShapeDtypeStruct(f2c.shape, f2c.dtype),
            jax.ShapeDtypeStruct((skp, C), jnp.float32),
            jax.ShapeDtypeStruct((skp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((skp, Lc), jnp.float32),
                        pltpu.VMEM((skp, Lc), jnp.float32),
                        pltpu.VMEM((skp, Lc), jnp.float32)],
        interpret=_interpret(),
    )(f1c, f2c, wp, bp, masks, jbar)
    return df1, df2, dw, db


_fused_joints.defvjp(_fj_fwd, _fj_bwd)


def fused_dense_iic_raw_joints(w: jnp.ndarray, b: jnp.ndarray,
                               f1: jnp.ndarray, f2: jnp.ndarray, *,
                               num_subheads: int, num_clusters: int,
                               padding: int, T: float = 1.0) -> jnp.ndarray:
    """Raw (unnormalized) per-subhead displacement joints
    [S, Td, Td, K, K] straight from tapped features — numerically the
    joints of ``dense_cluster_probs_merged`` +
    ``_merged_displacement_joints`` without materializing the probability
    maps. ``w`` [C, S*K], ``b`` [S*K]; ``f1`` the aligned view, ``f2`` the
    transformed view, both NHWC f32."""
    S, K = num_subheads, num_clusters
    Kp = _round_up(K, 8)
    B, H, W, C = f1.shape
    nch, Lc = pick_chunks(H, W, S * Kp)
    wp, bp = _pad_params(w, b, S, K, Kp, T)
    f1c = _chunk_planes(f1, nch, Lc)
    f2c = _chunk_planes(f2, nch, Lc)
    geom = (H, W, nch, Lc)
    raw = _fused_joints(f1c, f2c, wp, bp, (H, W, nch), S, Kp, padding, geom)
    Td = 2 * padding + 1
    r = raw.reshape(Td, Td, S, Kp, S, Kp)
    diag = jnp.arange(S)
    r = r[:, :, diag, :, diag, :]                 # [S, Td, Td, Kp, Kp]
    return r[:, :, :, :K, :K]


def use_iic_kernel() -> bool:
    """Gate for the fused dense-IIC kernel. CONTRASTYOU_IIC_MERGED:
    "0" = vmapped per-subhead path, "1" = merged XLA path,
    "kernel" = this kernel; default: kernel on TPU, merged elsewhere
    (CPU suites opt in via =kernel, which runs interpret mode)."""
    import os
    v = perf_knob("IIC_MERGED")
    if v == "kernel":
        return True
    if v in ("0", "1"):
        return False
    return jax.default_backend() == "tpu"
