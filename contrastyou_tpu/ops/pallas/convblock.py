"""Fused conv3x3 + BatchNorm + ReLU "plane" kernels for the U-Net ConvBlocks.

Why (round-2 profile, BENCH_NOTES.md): XLA on this backend runs the
wide-spatial small-channel layers at ~18 TFLOP/s, with the non-matmul half of
the step dominated by layout copies and convert_reduce BN fusions — the MXU
output-lane dim is C_out (32 of 128 lanes) and activations get a
(batch x channel) tiling that pads 10->16 and 32->128 (6.4x bytes/pass).
This kernel family flips the formulation:

- activations are zero-BORDERED "planes" ``[B, C, Lbuf]``: channels in
  SUBLANES, flattened (H+2)x(W+2) spatial in LANES (full 128-lane tiles).
  SAME-padding is the plane border itself.
- a conv tap (dy,dx) is a LANE-OFFSET slice of the plane (offset
  (dy-1)*rs+(dx-1), rs = the geometry's row stride — W+2, or the next
  128-multiple when alignment pays), so the 3x3 im2col is 9 sublane-offset
  writes into a
  VMEM ``patches [9*C_in, MB]`` scratch and the conv is ONE
  ``W2 [C_out, 9*C_in] @ patches`` matmul: K = 9*C_in, lanes = MB — ~70% MXU
  at C_in=32 vs ~6% for the (M=pixels, K=9*C_in, N=C_out) shape XLA uses.
- the previous layer's BN-apply + ReLU fuses into the tap loads (one VPU FMA
  per block, borders re-zeroed so implicit SAME padding stays exact), and BN
  batch statistics ride along as per-(batch, block) partial sums (zero
  borders contribute nothing; the divisor is the true pixel count), summed
  by XLA outside (tiny [B, nblocks, C, 2] tensor).

Round-3 generalization: the lane-block size MB and the aligned-load halo PAD
are now PER-GEOMETRY (``pick_geometry``) instead of module constants, so the
deep C in {128, 256, 512} levels at 56^2/28^2/14^2 fit the ~16 MB VMEM budget
(patches scratch scales as 9*C_in*MB) and small planes stop paying for
4096-lane blocks. The legacy wide-layer geometry (MB=4096, PAD=256) is what
``pick_geometry`` returns for C<=64 at 224^2/112^2 — those layers' measured
numbers are unchanged.

Reference semantics: arch/unet.py:16-31 _ConvBlock (conv-bn-act x2).
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ...perf import get as perf_knob


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class PlaneGeo(NamedTuple):
    """Static plane-layout geometry (hashable: rides static args / cache
    keys). ``mb``: output lanes per grid step; ``pad``: aligned-load halo
    (must cover the max tap offset rs+1); ``P``: real plane length
    (H+2)*rs; ``lbuf``: guarded buffer length; ``nj``: grid steps;
    ``rs``: row stride in lanes (>= W+2; when 128-aligned, every
    [B,C,Lbuf] <-> [B,C,H+2,rs] row split in the stage-chaining glue is a
    free bitcast instead of a re-tiling copy — the round-3 trace put those
    copies at ~8 ms/step at 224^2)."""
    mb: int
    pad: int
    P: int
    lbuf: int
    nj: int
    rs: int


#: legacy wide-layer constants (224^2/112^2, C<=64) — kept as defaults so the
#: round-2 tuned configuration is byte-identical
MB = 4096
PAD = 256

#: VMEM budget for the patches scratch (the dominant per-call buffer); the
#: wide f32 tap vector, in/out plane blocks and w2 ride alongside, all well
#: under the ~16 MB/core budget at this cap.
_PATCH_BUDGET = 6 << 20


def make_geo(H: int, W: int, mb: int, pad: int,
             rs: Optional[int] = None) -> PlaneGeo:
    rs = rs or (W + 2)
    P = (H + 2) * rs
    ppad = ((P + mb - 1) // mb) * mb
    return PlaneGeo(mb, pad, P, mb + ppad + mb, ppad // mb, rs)


#: align the row stride to 128 lanes only while the padding overhead stays
#: below this factor (224^2: 256/226=1.13x -> aligned; 56^2: 128/58=2.2x ->
#: legacy — the deep levels would pay more in kernel load traffic than the
#: glue saves).
_ALIGN_MAX_WASTE = 1.5


def _align_enabled() -> bool:
    # Default OFF: the round-3 on-chip A/B measured the aligned stride a net
    # LOSS end-to-end (267.2 vs 276.8 slices/s; 112-only 275.9) — the +13%
    # lbuf and the pad 256->384 halo growth cost the kernels more than the
    # bitcast row splits save once plane_maxpool uses strided slices instead
    # of pair reshapes. Kept as a knob for future toolchains.
    import os
    return perf_knob("PLANE_ALIGN") == "1"


def pick_geometry(H: int, W: int, cmax: int, itemsize: int = 2,
                  align: Optional[bool] = None) -> PlaneGeo:
    if align is None:
        align = _align_enabled()
    gc = perf_knob("PLANE_GEOCOST")
    if gc == "":
        # auto: the measured-best weight per routing (round-4 A/B ledger)
        # — 1.0 when the parity chain carries the differentiated forward
        # (14.63 ms whole-model), 0.5 for the interleaved full-res chain
        # (14.68 vs 15.24 at 1.0; "fwd"/"0" modes train no-parity, and the
        # fwd-only parity passes measure within 0.05 ms of either weight).
        gc = "1" if perf_knob("PLANE_PARITY") in ("", "1") else "0.5"
    return _pick_geometry(H, W, cmax, itemsize, align, float(gc))


@lru_cache(maxsize=None)
def _pick_geometry(H: int, W: int, cmax: int, itemsize: int,
                   align: bool, lbw: float = 0.0) -> PlaneGeo:
    """Choose (mb, pad, rs) for a plane stage whose widest conv has ``cmax``
    input channels: minimize the total lanes actually processed
    ``nj * (mb + 2*pad)`` (each grid step loads its block plus the halo
    overlap, so small blocks re-load every lane ~(1 + 2*pad/mb) times),
    breaking ties toward larger blocks (fewer grid steps / bigger matmuls),
    subject to the patches scratch ``9*cmax*mb*itemsize`` fitting the VMEM
    budget and ``mb >= pad`` (the guard block must cover the halo
    look-back). ``align``: use a 128-aligned row stride when the padding
    waste is acceptable (CONTRASTYOU_PLANE_ALIGN=0 forces the legacy W+2
    stride everywhere — A/B knob).

    ``lbw`` (CONTRASTYOU_PLANE_GEOCOST): weight of ``lbuf`` in the cost.
    The legacy cost only counts kernel window re-reads, but every
    f32/bf16 elementwise pass outside the kernels (backward cotangent
    glue, masks, chaining pads) covers the FULL guarded buffer — at
    quarter geometry (112^2, the parity chain) the mb-granular guards
    make lbuf/P = 1.42 under the legacy pick (mb=2048) vs 1.18 at
    mb=1024. lbw > 0 trades window traffic for smaller buffers."""
    rs = W + 2
    aligned = ((W + 2 + 127) // 128) * 128
    if align and aligned <= _ALIGN_MAX_WASTE * (W + 2):
        rs = aligned
    # halo must cover the max 3x3 tap offset rs+1, at 128-lane granularity
    pad = max(128, ((rs + 1 + 127) // 128) * 128)
    crep = 1 if cmax >= 8 else 8 // cmax
    best = None
    for mb in (4096, 2048, 1024, 512, 256, 128):
        if mb < pad or 9 * cmax * crep * mb * itemsize > _PATCH_BUDGET:
            continue
        geo = make_geo(H, W, mb, pad, rs)
        key = (geo.nj * (mb + 2 * pad) + lbw * geo.lbuf, -mb)
        if best is None or key < best[0]:
            best = (key, geo)
    if best is None:
        raise ValueError(
            f"no plane geometry fits VMEM for H={H} W={W} cmax={cmax}")
    return best[1]


def _default_geo(H: int, W: int) -> PlaneGeo:
    return make_geo(H, W, MB, PAD)


def plane_geometry(H: int, W: int) -> Tuple[int, int]:
    """(P, Lbuf) under the LEGACY default geometry (kept for tests)."""
    g = _default_geo(H, W)
    return g.P, g.lbuf


def tap_offsets(rs: int) -> Tuple[int, ...]:
    """3x3 stencil lane offsets for a plane layout of row stride ``rs``
    (pass ``geo.rs``; the legacy stride is W+2)."""
    return tuple((dy - 1) * rs + (dx - 1)
                 for dy in range(3) for dx in range(3))


def to_planes(x: jnp.ndarray, dtype=jnp.bfloat16,
              geo: Optional[PlaneGeo] = None) -> jnp.ndarray:
    """NHWC [B,H,W,C] -> guarded plane layout [B, C, Lbuf], zero borders
    (rows padded to ``geo.rs`` lanes; lanes past W+2 are dead and zero)."""
    B, H, W, C = x.shape
    g = geo or _default_geo(H, W)
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, g.rs - W - 1),
                                   (0, 0)))
    xp = xp.transpose(0, 3, 1, 2).reshape(B, C, g.P)
    return jnp.pad(xp, ((0, 0), (0, 0), (g.mb, g.lbuf - g.P - g.mb)))


def from_planes(xp: jnp.ndarray, H: int, W: int,
                geo: Optional[PlaneGeo] = None) -> jnp.ndarray:
    """guarded planes [B, C, Lbuf] -> NHWC [B,H,W,C] (drop borders/guards)."""
    B, C, _ = xp.shape
    g = geo or _default_geo(H, W)
    core = xp[:, :, g.mb:g.mb + g.P].reshape(B, C, H + 2, g.rs)
    return core[:, :, 1:H + 1, 1:W + 1].transpose(0, 2, 3, 1)


def border_mask(H: int, W: int, geo: Optional[PlaneGeo] = None) -> jnp.ndarray:
    """[1, Lbuf] f32: 1 on interior pixels, 0 on borders/guards/padding."""
    g = geo or _default_geo(H, W)
    idx = np.arange(g.lbuf) - g.mb
    row, col = idx // g.rs, idx % g.rs
    ok = ((idx >= 0) & (idx < g.P) & (row >= 1) & (row <= H)
          & (col >= 1) & (col <= W))
    return jnp.asarray(ok, jnp.float32)[None, :]


_FLIP9 = np.arange(8, -1, -1)     # (dy,dx) -> (2-dy, 2-dx) tap permutation


def fold_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Cin,Cout] HWIO -> [Cout, 9*Cin] tap-major (dy,dx,ci) fold."""
    k = kernel.transpose(3, 0, 1, 2)              # [Cout, 3, 3, Cin]
    return k.reshape(k.shape[0], -1)


def fold_kernel_transposed(kernel: jnp.ndarray) -> jnp.ndarray:
    """Fold for the TRANSPOSED conv (dx pass of backward): correlate the
    cotangent with the spatially flipped kernel, swapping in/out channels.
    The flip is a constant 9-row permutation of the tap axis (a plain
    ``reverse`` showed up as a ~0.6 ms op in the step trace)."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    taps = kernel.reshape(9, cin, cout)[_FLIP9]   # [9, Cin, Cout] flipped
    return taps.transpose(1, 0, 2).reshape(cin, 9 * cout)


def _conv_plane_kernel_dyg(x_ref, w2t_ref, a_ref, b_ref, mask_ref,
                           out_ref, part_ref, patches,
                           *, rs: int, cin: int, crep: int, apply_bn: bool,
                           mb: int, pad: int, nmerge: bool = False):
    """dy-grouped 3x3 variant of :func:`_conv_plane_kernel`: THREE input
    rolls (one per kernel ROW, window starting one lane early) into a shared
    ``[3*rows, mb+128]`` patches scratch, then three K=3*rows matmuls (one
    per kernel COLUMN dx, whose taps differ only by a 1-lane shift) combined
    with shifted lanes: ``out[t] = sum_dx z_dx[t + dx]``. Same MACs, 3x less
    patches write traffic and 6 fewer full-width VPU rotates than the 9-roll
    form, at the cost of two [Cout, mb+128] f32 output rotates. ``w2t`` is
    the TRANSPOSED dy-grouped fold ``[9*rows, Cout]`` (built in
    conv_plane_geo) so the per-dx slices are sublane slices. Lanes past
    mb+1 of a patches window may wrap stale halo data — they never reach
    ``out[:, :mb]`` after the shifted combine."""
    j = pl.program_id(1)
    wide_lo = mb + j * mb - pad
    width = mb + 2 * pad
    xw = x_ref[0, :, pl.ds(wide_lo, width)].astype(jnp.float32)
    mw = mask_ref[:, pl.ds(wide_lo, width)]
    if apply_bn:
        h = xw * a_ref[:] + b_ref[:]
        h = jnp.maximum(h, 0.0)
        xw = jnp.where(mw > 0, h, 0.0)
    rows = cin * crep
    dtype = out_ref.dtype
    mbw = mb + 128
    for r in range(3):                       # kernel row dy
        off = (r - 1) * rs - 1               # window starts at lane -1
        rel = (-(pad + off)) % width
        blk = pltpu.roll(xw, rel, 1)[:, :mbw].astype(dtype)
        if crep > 1:
            blk = pltpu.repeat(blk, crep, 0)
        patches[pl.ds(r * rows, rows), :] = blk
    if nmerge:
        # N-merged form: the three dx-dots contract the SAME patches with
        # different weight slices, so they are ONE dot with the dx groups
        # concatenated along the output dim — [3*rows, 3*Cout]. At Cout=32
        # each separate dot filled only a quarter of the MXU's 128-wide
        # output tile (the r5 floor analysis put the wide plane levels AT
        # that padded floor); merging pads 96->128 instead of 3x(32->128).
        # The dx lane shifts move to f32 sublane slices of the one result.
        cout = out_ref.shape[1]
        z = jax.lax.dot_general(
            w2t_ref[:], patches[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [3*Cout, mbw]
        acc = z[:cout, :]
        for dx in (1, 2):
            acc = acc + pltpu.roll(z[dx * cout:(dx + 1) * cout, :],
                                   (-dx) % mbw, 1)
    else:
        acc = None
        for dx in range(3):                  # kernel column
            wsl = w2t_ref[pl.ds(dx * 3 * rows, 3 * rows), :]
            z = jax.lax.dot_general(
                wsl, patches[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [Cout, mbw]
            if dx:
                z = pltpu.roll(z, (-dx) % mbw, 1)
            acc = z if acc is None else acc + z
    out = acc[:, :mb].astype(out_ref.dtype)
    out_ref[0, :, :] = out
    m_out = pltpu.roll(mw, (-pad) % width, 1)[0, :mb]
    v = jnp.where(m_out > 0, out.astype(jnp.float32), 0.0)
    part_ref[0, 0, 0, :] = jnp.sum(v, axis=1)
    part_ref[0, 0, 1, :] = jnp.sum(v * v, axis=1)


def _conv_plane_kernel(x_ref, w2_ref, a_ref, b_ref, mask_ref,
                       out_ref, part_ref, patches,
                       *, offsets, cin: int, crep: int, apply_bn: bool,
                       mb: int, pad: int):
    """grid (B, nj). One step: ONE aligned wide load + static lane-rolls per
    tap (Mosaic requires 128-aligned vector loads), fused bn-apply/relu,
    patches scratch, one matmul -> preactivation block + stat partials.

    ``crep``: sublane replication factor for tiny C_in (patches rows must be
    written at 8-aligned sublane offsets, so C_in < 8 is replicated to
    ``crep*cin`` rows and w2 carries weight/crep in each replica slot)."""
    j = pl.program_id(1)
    wide_lo = mb + j * mb - pad
    width = mb + 2 * pad
    # Mosaic's lane rotate is 32-bit only -> convert the wide vector ONCE,
    # roll in f32, cast per-tap patches back to the storage dtype.
    xw = x_ref[0, :, pl.ds(wide_lo, width)].astype(jnp.float32)
    mw = mask_ref[:, pl.ds(wide_lo, width)]                  # [1,  mb+2pad]
    if apply_bn:
        # bn-apply + relu + border-zeroing are POSITION-based, so apply them
        # once to the wide vector instead of once per rolled tap (9x VPU)
        h = xw * a_ref[:] + b_ref[:]
        h = jnp.maximum(h, 0.0)
        xw = jnp.where(mw > 0, h, 0.0)
    rows = cin * crep
    dtype = out_ref.dtype
    for t, off in enumerate(offsets):
        rel = (-(pad + off)) % width                         # static shift
        blk = pltpu.roll(xw, rel, 1)[:, :mb].astype(dtype)   # [Cin, mb]
        if crep > 1:
            blk = pltpu.repeat(blk, crep, 0)                 # [rows, mb]
        patches[pl.ds(t * rows, rows), :] = blk
    acc = jax.lax.dot_general(
        w2_ref[:], patches[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [Cout, mb]
    out = acc.astype(out_ref.dtype)
    out_ref[0, :, :] = out
    m_out = pltpu.roll(mw, (-pad) % width, 1)[0, :mb]        # [mb]
    v = jnp.where(m_out > 0, out.astype(jnp.float32), 0.0)
    part_ref[0, 0, 0, :] = jnp.sum(v, axis=1)
    part_ref[0, 0, 1, :] = jnp.sum(v * v, axis=1)


def _conv_plane_kernel_multi(x_ref, w2_ref, a_ref, b_ref, mask_ref,
                             out_ref, part_ref, patches,
                             *, groups, cin: int, nb: int,
                             apply_bn: bool, mb: int, pad: int):
    """Multi-block sibling of :func:`_conv_plane_kernel` (round 3): the
    input stacks ``nb`` channel blocks of ``cin`` rows (e.g. the four
    2x2-parity planes of one image), ``groups`` is a static tuple of
    (block, lane-offset) pairs whose rolled taps build ONE shared patches
    scratch, and ONE zero-padded matmul produces ALL output blocks:
    ``w2 [Q*cout, G*cin] @ patches [G*cin, mb]`` (on the parity plan the
    zero rows are 16/9 the exact MACs — microseconds at these shapes;
    block-sparse per-run dots and per-block epilogues were both tried and
    OOMed the Mosaic VMEM stack at 18.6M/17.9M on the 4x32-row Up_conv2
    call, while this form fits). The stacked input block is loaded into
    VMEM once per grid step for ALL output blocks — the per-output-parity
    call form re-read it ``Q`` times (22.17 vs 15.60 ms whole-model).
    ``cin`` must be 8-aligned (sublane block slices); callers
    pre-replicate tinier inputs into the weights."""
    j = pl.program_id(1)
    wide_lo = mb + j * mb - pad
    width = mb + 2 * pad
    xw = x_ref[0, :, pl.ds(wide_lo, width)].astype(jnp.float32)
    mw = mask_ref[:, pl.ds(wide_lo, width)]                  # [1,  mb+2pad]
    if apply_bn:
        h = xw * a_ref[:] + b_ref[:]
        h = jnp.maximum(h, 0.0)
        xw = jnp.where(mw > 0, h, 0.0)
    dtype = out_ref.dtype
    subs = {}
    for gi, (bl, off) in enumerate(groups):
        if bl not in subs:
            subs[bl] = xw if nb == 1 else xw[bl * cin:(bl + 1) * cin, :]
        rel = (-(pad + off)) % width                         # static shift
        blk = pltpu.roll(subs[bl], rel, 1)[:, :mb].astype(dtype)
        patches[pl.ds(gi * cin, cin), :] = blk
    acc = jax.lax.dot_general(
        w2_ref[:], patches[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [Cout_t, mb]
    out = acc.astype(dtype)
    out_ref[0, :, :] = out
    m_out = pltpu.roll(mw, (-pad) % width, 1)[0, :mb]        # [mb]
    v = jnp.where(m_out > 0, acc, 0.0)
    part_ref[0, 0, 0, :] = jnp.sum(v, axis=1)
    part_ref[0, 0, 1, :] = jnp.sum(v * v, axis=1)


def conv_plane_geo(xp: jnp.ndarray, w2: jnp.ndarray, mask: jnp.ndarray,
                   H: int, W: int, *, apply_bn: bool = False,
                   a: Optional[jnp.ndarray] = None,
                   b: Optional[jnp.ndarray] = None,
                   geo: Optional[PlaneGeo] = None,
                   offsets: Optional[Tuple[int, ...]] = None):
    """One tap-set conv over guarded planes (default: the 3x3 tap set).

    xp [B, Cin, Lbuf]; w2 [Cout, T*Cin] (fold_kernel / fold_kernel_transposed
    / fold_taps output, T = len(offsets)); mask [1, Lbuf] f32. When
    ``apply_bn``, ``relu(a*x + b)`` (the previous layer's folded BN) is
    applied to every tap load, masked back to zero on borders/guards.

    ``offsets``: static lane offsets of the taps (defaults to
    :func:`tap_offsets` — the 3x3 stencil). The parity-decomposed UpConv
    kernels pass 2x2 stencils here.

    Returns (out_planes [B, Cout, Lbuf], partials [B, nj, 2, Cout] f32)
    where partials sum (over B, nj) to the masked sum / sum-of-squares of
    the stored-precision preactivation. Guard blocks of ``out`` are never
    written — downstream consumers must mask (they do: every tap load and
    the final apply are masked)."""
    B, cin, Lbuf = xp.shape
    cout = w2.shape[0]
    g = geo or _default_geo(H, W)
    assert g.lbuf == Lbuf, (g, Lbuf)
    if offsets is None:
        offsets = tap_offsets(g.rs)
    T = len(offsets)
    if max(abs(o) for o in offsets) > g.pad:
        # The pad-lane halo must cover the max tap offset; beyond that the
        # rolls would wrap stale halo lanes into the patches silently.
        raise ValueError(
            f"plane conv tap offsets {offsets} exceed the halo pad={g.pad}; "
            "route this layer through the XLA path instead")
    crep = 1 if cin >= 8 else 8 // cin      # 8-aligned patch-row writes
    if a is None:
        a = jnp.ones((cin,), jnp.float32)
        b = jnp.zeros((cin,), jnp.float32)
    if crep > 1:
        w3 = w2.reshape(cout, T, cin)
        w2 = jnp.broadcast_to(w3[:, :, None, :] / crep,
                              (cout, T, crep, cin)).reshape(cout, -1)
    dyg = T == 9 and offsets == tap_offsets(g.rs) and _dyg_enabled()
    if dyg:
        # dy-grouped transposed fold: columns (dy, dx, rows) -> sublanes
        # (dx, dy, rows), Cout -> lanes (see _conv_plane_kernel_dyg)
        rows = cin * crep
        w4 = w2.reshape(cout, 3, 3, rows).transpose(2, 1, 3, 0)
        if _nmerge_enabled(cout):
            # N-merged fold [3*rows, 3*cout]: dx groups side by side in
            # the output dim so the kernel runs ONE dot (see the kernel)
            dyg = "m"
            w2 = (w4.reshape(3, 3 * rows, cout).transpose(1, 0, 2)
                  .reshape(3 * rows, 3 * cout))
        else:
            w2 = w4.reshape(9 * rows, cout)
    f = _partitioned_conv(g.rs, apply_bn, str(jnp.dtype(xp.dtype)),
                          g.mb, g.pad, tuple(offsets), dyg)
    return f(xp, w2.astype(xp.dtype),
             a.reshape(cin, 1).astype(jnp.float32),
             b.reshape(cin, 1).astype(jnp.float32), mask)


def _dyg_enabled() -> bool:
    import os
    return perf_knob("PLANE_DYG") != "0"


def _nmerge_enabled(cout: int) -> bool:
    """N-merged dyg dot (one [3*rows, 3*Cout] dot instead of three
    [3*rows, Cout] dots). CONTRASTYOU_PLANE_NMERGE: "" auto — on when
    3*Cout still gains output-tile occupancy (Cout < 128; at Cout >= 128
    each split dot already fills the 128-wide tile); "1" always, "0" off."""
    raw = perf_knob("PLANE_NMERGE")
    if raw == "0":
        return False
    if raw == "1":
        return True
    return cout < 128


def _conv_plane_call(xp, w2, a, b, mask, *, rs: int, apply_bn: bool,
                     mb: int, pad: int,
                     offsets: Optional[Tuple[int, ...]] = None,
                     dyg: bool = False,
                     multi: Optional[Tuple[Tuple[int, int], ...]] = None,
                     nb: int = 1):
    """The raw pallas_call on (possibly per-shard local) operands.

    ``multi``: static ((block, offset), ...) group tuple selecting the
    multi-block kernel (:func:`_conv_plane_kernel_multi`): xp stacks ``nb``
    channel blocks, w2 is [Q*cout_blk, G*cin_blk]."""
    if offsets is None:
        offsets = tap_offsets(rs)
    B, cin, Lbuf = xp.shape
    if multi is not None:
        assert not dyg
        G = len(multi)
        cout, kcols = w2.shape
        cin_blk = kcols // G
        assert cin == nb * cin_blk, (cin, nb, cin_blk)
        assert cin_blk % 8 == 0, ("multi path needs 8-aligned per-block "
                                  "channels (pre-replicate tiny C_in)",
                                  cin_blk)
        kern = partial(_conv_plane_kernel_multi, groups=multi,
                       cin=cin_blk, nb=nb, apply_bn=apply_bn, mb=mb, pad=pad)
        w2_spec = pl.BlockSpec((cout, kcols), lambda bi, ji: (0, 0),
                               memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((kcols, mb), xp.dtype)
    elif dyg:
        kcols, wcols = w2.shape              # transposed dy-grouped fold
        nmerge = dyg == "m"
        # merged: w2 [3*rows, 3*cout]; split: w2 [9*rows, cout]
        cout = wcols // 3 if nmerge else wcols
        crep = kcols // ((3 if nmerge else 9) * cin)
        rows = cin * crep
        kern = partial(_conv_plane_kernel_dyg, rs=rs, cin=cin, crep=crep,
                       apply_bn=apply_bn, mb=mb, pad=pad, nmerge=nmerge)
        w2_spec = pl.BlockSpec((kcols, wcols), lambda bi, ji: (0, 0),
                               memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((3 * rows, mb + 128), xp.dtype)
    else:
        cout, kcols = w2.shape
        crep = kcols // (len(offsets) * cin)
        kern = partial(_conv_plane_kernel, offsets=offsets, cin=cin,
                       crep=crep, apply_bn=apply_bn, mb=mb, pad=pad)
        w2_spec = pl.BlockSpec((cout, kcols), lambda bi, ji: (0, 0),
                               memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((kcols, mb), xp.dtype)
    cin = xp.shape[1]                        # full stacked rows for specs
    nj = Lbuf // mb - 2
    return pl.pallas_call(
        kern,
        grid=(B, nj),
        in_specs=[
            pl.BlockSpec((1, cin, Lbuf), lambda bi, ji: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            w2_spec,
            pl.BlockSpec((cin, 1), lambda bi, ji: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, 1), lambda bi, ji: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lbuf), lambda bi, ji: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cout, mb), lambda bi, ji: (bi, 0, ji + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, cout), lambda bi, ji: (bi, ji, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, cout, Lbuf), xp.dtype),
            jax.ShapeDtypeStruct((B, nj, 2, cout), jnp.float32),
        ],
        scratch_shapes=[scratch],
        interpret=_interpret(),
    )(xp, w2, a, b, mask)


@lru_cache(maxsize=None)
def _partitioned_conv(rs: int, apply_bn: bool, _dtype_key: str,
                      mb: int, pad: int,
                      offsets: Optional[Tuple[int, ...]] = None,
                      dyg: bool = False,
                      multi: Optional[Tuple[Tuple[int, int], ...]] = None,
                      nb: int = 1):
    """GSPMD-partitionable wrapper: the kernel is independent per batch
    element, so under a data mesh each shard runs the pallas_call on its
    LOCAL batch (w2/a/b/mask replicated); the BN stat partials stay
    batch-sharded and the caller's XLA sum over the batch axis becomes the
    global (SyncBN) reduction. Without a mesh this is the plain call."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _raw(xp, w2, a, b, mask):
        return _conv_plane_call(xp, w2, a, b, mask, rs=rs, apply_bn=apply_bn,
                                mb=mb, pad=pad, offsets=offsets, dyg=dyg,
                                multi=multi, nb=nb)

    fn = custom_partitioning(_raw)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) > 0 else None

    def infer_sharding(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes)
        return (NamedSharding(mesh, P(baxis, None, None)),
                NamedSharding(mesh, P(baxis, None, None, None)))

    def partition(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes)
        rep = NamedSharding(mesh, P())
        arg_sh = (NamedSharding(mesh, P(baxis, None, None)),
                  rep, rep, rep, rep)
        out_sh = (NamedSharding(mesh, P(baxis, None, None)),
                  NamedSharding(mesh, P(baxis, None, None, None)))

        def lower_fn(xp, w2, a, b, mask):
            return _conv_plane_call(xp, w2, a, b, mask, rs=rs,
                                    apply_bn=apply_bn, mb=mb, pad=pad,
                                    offsets=offsets, dyg=dyg,
                                    multi=multi, nb=nb)

        return mesh, lower_fn, out_sh, arg_sh

    # Shardy propagation rule: only the batch factor ``bb`` passes through;
    # every other dimension is pinned replicated (the kernel owns lanes/
    # sublanes wholesale). The legacy callbacks cover the GSPMD partitioner.
    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="bb c l, o k, c2 u, c3 v, w l2 -> bb c4 l3, bb j t o2",
        need_replication_factors=("c", "l", "o", "k", "c2", "u", "c3", "v",
                                  "w", "l2", "c4", "l3", "j", "t", "o2"))
    return fn


def _dw_enabled(batch: int = 0) -> bool:
    """Weight-grad Pallas kernel gate (CONTRASTYOU_PLANE_DW, default OFF).
    Round-3 trace attributed ~5.2 ms of the 28.3 ms step to the XLA dk
    path (9 sliced einsums + [T,Ci,Co]-producing DUS loop fusions), and in
    isolation the kernel DID win (bench 327.2 -> 341.2 slices/s) — but the
    win came from filling the small-op bubbles the fused optimizer update
    (engine/optim.py fuse_small_leaves) also fills: with that landed,
    DW=1 measures 342 vs 346.5 slices/s (three-run A/B, BENCH_NOTES).
    XLA overlaps the einsums with the copies the kernel serializes behind
    its patches rebuild. Round 5: at pretrain batch 96 the einsum form
    collapses (11.4 vs 6.8 ms per dW, scripts_perf_dw — layout-bound, and
    dtype/hoisted-transpose variants measure identically) — auto routes
    the kernel at B >= 32; "" keeps XLA at the reference batch."""
    raw = perf_knob("PLANE_DW")
    if raw == "0":
        return False
    if raw == "1":
        return True
    return batch >= 96


def _dw_plane_kernel(x_ref, g_ref, dk_ref, patches,
                     *, offsets, cin: int, crep: int, mb: int, pad: int):
    """grid (B, nj). dk[t*rows+i, o] += sum_m x[i, m+off_t] * g[o, m] for
    the block's mb lanes — the same wide-load + static-roll patches build
    as the forward kernel, then ONE [T*rows, mb] x [Cout, mb]^T matmul,
    accumulated across the row-band grid steps into the per-batch output
    block (revisited while ji varies — the fast axis)."""
    ji = pl.program_id(1)
    wide_lo = mb + ji * mb - pad
    width = mb + 2 * pad
    xw = x_ref[0, :, pl.ds(wide_lo, width)].astype(jnp.float32)
    rows = cin * crep
    dtype = patches.dtype
    for t, off in enumerate(offsets):
        rel = (-(pad + off)) % width
        blk = pltpu.roll(xw, rel, 1)[:, :mb].astype(dtype)
        if crep > 1:
            blk = pltpu.repeat(blk, crep, 0)
        patches[pl.ds(t * rows, rows), :] = blk
    dk = jax.lax.dot_general(patches[:], g_ref[0],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(ji == 0)
    def _init():
        dk_ref[0] = dk

    @pl.when(ji > 0)
    def _acc():
        dk_ref[0] += dk


def _dw_plane_call(xp, g, *, mb: int, pad: int, offsets, crep: int):
    B, cin, Lbuf = xp.shape
    cout = g.shape[1]
    rows = cin * crep
    T = len(offsets)
    nj = Lbuf // mb - 2
    kern = partial(_dw_plane_kernel, offsets=offsets, cin=cin, crep=crep,
                   mb=mb, pad=pad)
    return pl.pallas_call(
        kern,
        grid=(B, nj),
        in_specs=[
            pl.BlockSpec((1, cin, Lbuf), lambda bi, ji: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, mb), lambda bi, ji: (bi, 0, ji + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T * rows, cout), lambda bi, ji: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T * rows, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T * rows, mb), xp.dtype)],
        interpret=_interpret(),
    )(xp, g)


@lru_cache(maxsize=None)
def _partitioned_dw(mb: int, pad: int, offsets, crep: int, _dtype_key: str):
    """GSPMD rule mirroring :func:`_partitioned_conv`: independent per
    batch element, so each shard computes its local per-sample dk partials
    and the caller's XLA sum over the batch axis is the global grad
    reduction (exactly how DP grad sync wants it)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _raw(xp, g):
        return _dw_plane_call(xp, g, mb=mb, pad=pad, offsets=offsets,
                              crep=crep)

    fn = custom_partitioning(_raw)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) > 0 else None

    def infer_sharding(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes)
        return NamedSharding(mesh, P(baxis, None, None))

    def partition(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes)
        sh = NamedSharding(mesh, P(baxis, None, None))
        return mesh, _raw, sh, (sh, sh)

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="bb c l, bb o l2 -> bb k o2",
        need_replication_factors=("c", "l", "o", "l2", "k", "o2"))
    return fn


def plane_conv_dw(xp: jnp.ndarray, g: jnp.ndarray, geo: PlaneGeo,
                  offsets) -> jnp.ndarray:
    """Weight gradient of a tap-set plane conv: dk [T, Cin, Cout] f32 from
    input planes ``xp`` [B, Cin, Lbuf] and the MASKED output cotangent
    ``g`` [B, Cout, Lbuf] (callers zero g on borders/guards, so lanes the
    rolls wrap past genuine data contribute exactly zero)."""
    B, cin, Lbuf = xp.shape
    cout = g.shape[1]
    offsets = tuple(offsets)
    T = len(offsets)
    if max(abs(o) for o in offsets) > geo.pad:
        raise ValueError(f"dw tap offsets {offsets} exceed halo {geo.pad}")
    crep = 1 if cin >= 8 else 8 // cin
    f = _partitioned_dw(geo.mb, geo.pad, offsets, crep,
                        str(jnp.dtype(xp.dtype)))
    parts = f(xp, g.astype(xp.dtype))               # [B, T*crep*cin, Cout]
    dk = parts.sum(0).reshape(T, crep, cin, cout)
    return dk[:, 0]


def _fusedbwd_enabled(batch: int = 0) -> bool:
    """Single-pass dx+dW backward (CONTRASTYOU_PLANE_FUSEDBWD, default
    OFF). The dx transposed-conv kernel already builds the full
    tap-patches of the masked cotangent; the weight grad contracts those
    SAME patches against the unshifted input block (``dk[t,i,o] =
    sum_m xp[i,m] * g[o, m-off_t]`` and the 3x3 offset set is symmetric
    under negation, so the tap axis just reverses) — one extra MXU matmul
    + one blocked load replace the 9 sliced XLA einsums. MEASURED WORSE
    round 4 (whole-model fwd+bwd 15.56 vs 15.01 ms, production routing):
    dW's FLOPs equal the conv's, and moving them into the kernel
    SERIALIZES them behind the dx matmul while XLA overlapped the einsums
    with the surrounding copies — the same overlap economics that rejected
    PLANE_DW in round 3. Round 5: at pretrain batch 96 the einsum dW is
    layout-bound and the economics flip hard — FUSEDBWD=1 took the
    decoder-pretrain step 320.7 -> 277.9 ms — so "" auto routes the fused
    kernel from batch 96 (like PLANE_DW; the bench batch-32/64 cached A/Bs
    measured the autos NEGATIVE at 32 — 344.9 vs 357.4 slices/s — and
    ambiguous at 64, so the threshold sits at the measured-win batch); the reference batch keeps the
    split form. Equivalence: tests/test_plane_fused_bwd.py."""
    raw = perf_knob("PLANE_FUSEDBWD")
    if raw == "0":
        return False
    if raw == "1":
        return True
    return batch >= 96


def _fused_bwd_kernel(g_ref, w2t_ref, x_ref, dx_ref, dk_ref, patches,
                      *, offsets, cg: int, crep: int, mb: int, pad: int):
    """grid (B, nj). Builds the tap patches of the masked cotangent once,
    then two matmuls:

      dx block   = w2t [Cin, T*cg*crep] @ patches [T*cg*crep, mb]
      dk partial = patches @ x_blk [Cin, mb]^T   (accumulated over ji)

    ``dk`` rows are tap-REVERSED relative to the true weight grad (the
    patches were built for the transposed conv; negating the symmetric
    offset set reverses the tap order) — the caller un-reverses."""
    ji = pl.program_id(1)
    wide_lo = mb + ji * mb - pad
    width = mb + 2 * pad
    gw = g_ref[0, :, pl.ds(wide_lo, width)].astype(jnp.float32)
    rows = cg * crep
    dtype = dx_ref.dtype
    for t, off in enumerate(offsets):
        rel = (-(pad + off)) % width
        blk = pltpu.roll(gw, rel, 1)[:, :mb].astype(dtype)
        if crep > 1:
            blk = pltpu.repeat(blk, crep, 0)
        patches[pl.ds(t * rows, rows), :] = blk
    dx = jax.lax.dot_general(
        w2t_ref[:], patches[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [Cin, mb]
    dx_ref[0, :, :] = dx.astype(dtype)
    dk = jax.lax.dot_general(
        patches[:], x_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [T*rows, Cin]

    @pl.when(ji == 0)
    def _init():
        dk_ref[0] = dk

    @pl.when(ji > 0)
    def _acc():
        dk_ref[0] += dk


def _fused_bwd_call(g, w2t, xp, *, mb: int, pad: int, offsets, crep: int):
    B, cg, Lbuf = g.shape
    cin = w2t.shape[0]
    rows = cg * crep
    T = len(offsets)
    nj = Lbuf // mb - 2
    kern = partial(_fused_bwd_kernel, offsets=offsets, cg=cg, crep=crep,
                   mb=mb, pad=pad)
    return pl.pallas_call(
        kern,
        grid=(B, nj),
        in_specs=[
            pl.BlockSpec((1, cg, Lbuf), lambda bi, ji: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, T * rows), lambda bi, ji: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, mb), lambda bi, ji: (bi, 0, ji + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cin, mb), lambda bi, ji: (bi, 0, ji + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T * rows, cin), lambda bi, ji: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, cin, Lbuf), g.dtype),
            jax.ShapeDtypeStruct((B, T * rows, cin), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((T * rows, mb), g.dtype)],
        interpret=_interpret(),
    )(g, w2t, xp)


@lru_cache(maxsize=None)
def _partitioned_fused_bwd(mb: int, pad: int, offsets, crep: int,
                           _dtype_key: str):
    """GSPMD rule mirroring :func:`_partitioned_conv`: batch-independent, so
    each shard runs on its local batch; dx stays batch-sharded and the dk
    partials' caller-side batch sum is the global grad reduction."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _raw(g, w2t, xp):
        return _fused_bwd_call(g, w2t, xp, mb=mb, pad=pad, offsets=offsets,
                               crep=crep)

    fn = custom_partitioning(_raw)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) > 0 else None

    def infer_sharding(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes)
        sh = NamedSharding(mesh, P(baxis, None, None))
        return (sh, sh)

    def partition(mesh, arg_shapes, result_shape):
        baxis = _batch_axis(arg_shapes)
        sh = NamedSharding(mesh, P(baxis, None, None))
        rep = NamedSharding(mesh, P())
        return mesh, _raw, (sh, sh), (sh, rep, sh)

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="bb c l, i k, bb c2 l2 -> bb i2 l3, bb k2 i3",
        need_replication_factors=("c", "l", "i", "k", "c2", "l2", "i2",
                                  "l3", "k2", "i3"))
    return fn


def plane_conv_bwd_fused(xp: jnp.ndarray, kernel: jnp.ndarray,
                         g: jnp.ndarray, geo: PlaneGeo):
    """Fused backward of a 3x3 plane conv: (dx_raw [B,Cin,Lbuf],
    dk [3,3,Cin,Cout]) from the input planes ``xp`` and the MASKED
    cotangent ``g`` (zero on borders/guards — so wrapped halo lanes and
    the ppad tail contribute exactly zero to both products). dx guard
    blocks are unwritten; the caller masks."""
    B, cin, Lbuf = xp.shape
    cg = g.shape[1]                        # = Cout of the forward conv
    offsets = tap_offsets(geo.rs)
    T = len(offsets)
    if max(abs(o) for o in offsets) > geo.pad:
        raise ValueError(f"bwd tap offsets {offsets} exceed halo {geo.pad}")
    w2t = fold_kernel_transposed(kernel)   # [Cin, 9*Cout], tap-flipped
    crep = 1 if cg >= 8 else 8 // cg
    if crep > 1:
        w3 = w2t.reshape(cin, T, cg)
        w2t = jnp.broadcast_to(w3[:, :, None, :] / crep,
                               (cin, T, crep, cg)).reshape(cin, -1)
    f = _partitioned_fused_bwd(geo.mb, geo.pad, tuple(offsets), crep,
                               str(jnp.dtype(xp.dtype)))
    dx, parts = f(g.astype(xp.dtype), w2t.astype(xp.dtype), xp)
    dk = parts.sum(0).reshape(T, crep, cg, cin)[::-1, 0]   # un-reverse taps
    return dx, dk.transpose(0, 2, 1).reshape(3, 3, cin, cg)


def bn_affine(stats_sum: jnp.ndarray, stats_sqsum: jnp.ndarray, count: float,
              scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5):
    """Fold batch stats + BN params into the (a, b) of y = a*x + b.
    Returns (a, b, mean, var) — mean/var feed the running-stat update."""
    mean = stats_sum / count
    var = jnp.maximum(stats_sqsum / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    aa = scale * inv
    bb = bias - scale * inv * mean
    return aa, bb, mean, var


def _bn_vjp_enabled() -> bool:
    """Custom backward for the plane BN+ReLU apply (CONTRASTYOU_PLANE_BNVJP,
    default 1): autodiff of ``maximum(x*a+b, 0)`` saves the F32
    pre-activation of every plane conv as a residual (a [B, C, Lbuf] f32
    write+read per conv — the (f32, bf16) convert_element_type fusion
    pairs in the round-3 trace). The hand-written backward rebuilds the
    ReLU mask from the BF16 output (already live as the stage output) and
    contracts against the bf16 input (already saved by the conv's own
    VJP), so no f32 residual exists. Equal up to the measure-zero case of
    a pre-activation positive but below the smallest bf16 subnormal."""
    import os
    return perf_knob("PLANE_BNVJP") != "0"


def _bn_apply_fwd_math(xp, a, b, mask):
    if a.ndim == 1:
        ab, bb = a[None, :, None], b[None, :, None]
    else:
        ab, bb = a[:, :, None], b[:, :, None]
    h = xp.astype(jnp.float32) * ab + bb
    h = jnp.maximum(h, 0.0)
    return jnp.where(mask[None] > 0, h, 0.0).astype(xp.dtype)


@jax.custom_vjp
def _bn_relu_planes_vjp(xp, a, b, mask):
    return _bn_apply_fwd_math(xp, a, b, mask)


def _bn_relu_planes_fwd(xp, a, b, mask):
    out = _bn_apply_fwd_math(xp, a, b, mask)
    return out, (xp, a, out, mask)


def _bn_relu_planes_bwd(res, g):
    xp, a, out, mask = res
    gh = jnp.where(out > 0, g.astype(jnp.float32), 0.0)   # ReLU+mask gate
    ab = a[None, :, None] if a.ndim == 1 else a[:, :, None]
    gx = (gh * ab).astype(xp.dtype)
    gax = gh * xp.astype(jnp.float32)
    if a.ndim == 1:
        ga = gax.sum((0, 2))
        gb = gh.sum((0, 2))
    else:
        ga = gax.sum(2)
        gb = gh.sum(2)
    return (gx, ga.astype(a.dtype), gb.astype(a.dtype),
            jnp.zeros_like(mask))


_bn_relu_planes_vjp.defvjp(_bn_relu_planes_fwd, _bn_relu_planes_bwd)


def apply_bn_relu_planes(xp: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """Final-layer BN+ReLU on planes in plain XLA (the plane layout tiles
    cleanly, so XLA elementwise is already efficient here). ``a``/``b`` are
    [C] (whole-batch stats) or [B, C] (per-group stats broadcast to
    samples). Backward: :func:`_bn_vjp_enabled`."""
    if _bn_vjp_enabled():
        return _bn_relu_planes_vjp(xp, a, b,
                                   jax.lax.stop_gradient(mask))
    return _bn_apply_fwd_math(xp, a, b, mask)


# --- differentiable pure plane conv (custom VJP) ------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def plane_conv(xp: jnp.ndarray, kernel: jnp.ndarray, mask: jnp.ndarray,
               H: int, W: int,
               geo: Optional[PlaneGeo] = None) -> jnp.ndarray:
    """3x3 SAME conv on guarded planes; ``kernel`` is HWIO [3,3,Cin,Cout].
    Pure conv — BN/ReLU/stat glue lives in XLA where autodiff handles it.
    The kernel never writes guard blocks, so the raw output (and the raw
    dx of the backward) is masked here — downstream consumers and their
    VJPs then only ever see defined values."""
    out, _ = conv_plane_geo(xp, fold_kernel(kernel), mask, H, W, geo=geo)
    return jnp.where(mask[None] > 0, out, 0).astype(xp.dtype)


def _plane_conv_fwd(xp, kernel, mask, H, W, geo):
    return plane_conv(xp, kernel, mask, H, W, geo), (xp, kernel, mask)


def _plane_conv_bwd(H, W, geo, res, g):
    xp, kernel, mask = res
    gg = geo or _default_geo(H, W)
    g = jnp.where(mask[None] > 0, g, 0).astype(xp.dtype)
    if _fusedbwd_enabled(xp.shape[0]) and xp.shape[1] >= 8:
        # single-pass dx+dW: the dk contraction rides the dx kernel's
        # cotangent patches (see _fusedbwd_enabled). cin < 8 (the image
        # conv) stays on the split path — a 1-lane dk output tile wastes
        # the MXU and the einsum there is tiny.
        dxp, dk = plane_conv_bwd_fused(xp, kernel, g, gg)
        dxp = jnp.where(mask[None] > 0, dxp, 0).astype(xp.dtype)
        return dxp, dk.astype(kernel.dtype), None
    # dx: transposed conv = plane conv of the cotangent with the spatially
    # flipped, channel-swapped kernel (same Pallas kernel).
    dxp, _ = conv_plane_geo(g, fold_kernel_transposed(kernel), mask, H, W,
                            geo=geo)
    dxp = jnp.where(mask[None] > 0, dxp, 0).astype(xp.dtype)
    # dw: dk[t,i,o] = sum_b,m xp[b,i,m+off_t] * g[b,o,m] via per-tap
    # sliced einsums (XLA fuses the lane slices into the dots and overlaps
    # them with copies). CONTRASTYOU_PLANE_DW=1 opts into the fused Pallas
    # dW kernel — measured a net LOSS once the fused optimizer update
    # landed (see _dw_enabled).
    if _dw_enabled(xp.shape[0]):
        dk9 = plane_conv_dw(xp, g, gg, tap_offsets(gg.rs))
        dk = dk9.reshape(3, 3, *dk9.shape[1:])
    else:
        # contract in the STORED bf16 with f32 accumulation: the operands
        # are bf16-valued, so upcasting adds no information — it only
        # tripled the MXU passes (f32 dot = 3 bf16 passes) and doubled the
        # slice read traffic; at pretrain batch 96 the f32 form was 22.7 ms
        # of dW for Up_conv2 alone (r5 trace)
        gs = g[:, :, gg.mb:gg.mb + gg.P]
        dks = []
        for off in tap_offsets(gg.rs):
            xs = jax.lax.dynamic_slice_in_dim(xp, gg.mb + off, gg.P, 2)
            dks.append(jnp.einsum("bim,bom->io", xs, gs,
                                  preferred_element_type=jnp.float32))
        dk = jnp.stack(dks, 0).reshape(3, 3, *dks[0].shape)
    return dxp, dk.astype(kernel.dtype), None


plane_conv.defvjp(_plane_conv_fwd, _plane_conv_bwd)


def masked_stats(p: jnp.ndarray, mask: jnp.ndarray, count: float):
    """Masked per-channel (sum, sumsq) of planes -> mean, biased var.
    Differentiable XLA glue; the plane layout reduces efficiently."""
    v = jnp.where(mask[None] > 0, p.astype(jnp.float32), 0.0)
    s = v.sum((0, 2))
    sq = (v * v).sum((0, 2))
    mean = s / count
    var = jnp.maximum(sq / count - mean * mean, 0.0)
    return mean, var


def masked_stats_per_sample(p: jnp.ndarray, mask: jnp.ndarray):
    """Masked per-(sample, channel) (sum, sumsq) of planes — the group-wise
    stats of the fused two-stage step are slices-sums of these."""
    v = jnp.where(mask[None] > 0, p.astype(jnp.float32), 0.0)
    return v.sum(2), (v * v).sum(2)                         # each [B, C]


def _group_mv(ssum: jnp.ndarray, ssq: jnp.ndarray, groups, hw: int):
    """Per-batch sums [B, C] -> [(mean, var)] per contiguous group."""
    out, lo = [], 0
    for g in groups:
        cnt = float(g * hw)
        mean = ssum[lo:lo + g].sum(0) / cnt
        var = jnp.maximum(ssq[lo:lo + g].sum(0) / cnt - mean * mean, 0.0)
        out.append((mean, var))
        lo += g
    return out


def _broadcast_affine(mvs, scale, bias, groups, eps):
    """[(mean, var)] per group -> per-sample (a, b) [B, C] plus the list of
    per-group (a, b) (for in-kernel use)."""
    a_rows, b_rows = [], []
    for (mean, var), g in zip(mvs, groups):
        a = scale * jax.lax.rsqrt(var + eps)
        b = bias - a * mean
        a_rows.append(jnp.broadcast_to(a, (g, a.shape[0])))
        b_rows.append(jnp.broadcast_to(b, (g, b.shape[0])))
    return jnp.concatenate(a_rows, 0), jnp.concatenate(b_rows, 0)


def stage_geometry(H: int, W: int, cin: int, cout: int, cskip: int = 0,
                   dtype=jnp.bfloat16) -> PlaneGeo:
    """The geometry :func:`convblock_stage` uses for a block of this shape —
    exposed so the UNet orchestrator can verify producer/consumer plane
    layouts match before chaining stages without NHWC round-trips."""
    return pick_geometry(H, W, max(cin, cout, cskip),
                         jnp.dtype(dtype).itemsize)


def convblock_stage(x: jnp.ndarray, skip: Optional[jnp.ndarray],
                    k0: jnp.ndarray, k1: jnp.ndarray,
                    affine0: Tuple[jnp.ndarray, jnp.ndarray],
                    affine1: Tuple[jnp.ndarray, jnp.ndarray],
                    *, eps: float = 1e-5, dtype=jnp.bfloat16,
                    bn_groups: Optional[Tuple[int, ...]] = None,
                    plane_info: Optional[Tuple[int, int]] = None,
                    skip_is_plane: bool = False,
                    plane_out: bool = False,
                    eval_affine=None):
    """Full ConvBlock (conv0[+skip split] -> BN -> ReLU -> conv1 -> BN ->
    ReLU) on planes, batch-statistics mode. Fully differentiable: the convs
    are Pallas (custom VJP), the BN/ReLU/stat glue is XLA on plane layouts.

    ``bn_groups``: optional contiguous batch-subset sizes — each subset is
    normalized with its OWN batch statistics (the fused two-stage step);
    the kernel's per-(batch, block) stat partials make the group reduction
    free (slice-sums of the same [B, C] tensor).

    Plane chaining (round 3): ``plane_info=(H, W)`` declares that ``x`` is
    ALREADY in this stage's guarded plane layout [B, C, Lbuf] (the producer
    must share :func:`stage_geometry`); ``skip_is_plane`` likewise for the
    skip; ``plane_out=True`` returns the output planes instead of NHWC —
    the UNet forward uses these to drop the to/from-plane conversions
    between adjacent plane stages (the round-2b trace put them at
    ~4 ms/step).

    Returns (out NHWC in ``dtype`` — or planes when ``plane_out`` —,
    (g_mv0, g_mv1)) where each g_mv is a list of per-group (mean, var) f32
    pairs (length 1 without groups) — they feed the caller's
    running-average updates.

    ``eval_affine=((a0, b0), (a1, b1))`` (f32 [C] vectors precomputed from
    RUNNING stats) switches the stage to inference-mode BN — the affine is
    applied directly, no batch statistics are formed, and the returned
    mv lists are ``None`` (round 3: eval/teacher forwards route through
    the plane kernels too; ref nn.BatchNorm eval semantics).

    ``skip`` reproduces ConvBlock(skip=...): conv0 acts on
    ``concat([skip, x], -1)`` via two plane convs on slices of ``k0``.

    All planes inside one stage share ONE geometry picked for the widest
    conv (cmax), so conv0's output feeds conv1 without a re-layout."""
    if plane_info is None:
        B, H, W, cin_x = x.shape
    else:
        H, W = plane_info
        B, cin_x, _ = x.shape
    cs = ((skip.shape[1] if skip_is_plane else skip.shape[-1])
          if skip is not None else 0)
    cout = k1.shape[-1]
    geo = stage_geometry(H, W, cin_x, cout, cs, dtype)
    mask = border_mask(H, W, geo)
    groups = tuple(bn_groups) if bn_groups else (B,)
    hw = H * W
    xp = x if plane_info is not None else to_planes(x, dtype, geo)
    assert xp.shape[-1] == geo.lbuf, (xp.shape, geo)
    if skip is not None:
        sp = skip if skip_is_plane else to_planes(skip, dtype, geo)
        assert sp.shape[-1] == geo.lbuf, (sp.shape, geo)
        # conv over concat = sum of two convs; stats of the SUM are not the
        # sum of per-conv stats (sumsq is nonlinear), so reduce in XLA here.
        # (Round-3 negative result: running conv0 as ONE kernel call on the
        # channel-concat planes is VMEM-INFEASIBLE — the full-plane input
        # block is double-buffered across the batch grid, so the concat
        # needs 2*(cs+cin)*Lbuf*2B of VMEM: 15.7 MB for 64ch at the 224^2
        # Lbuf, 12.6 MB + 3.2 MB dyg scratch for 128ch at 112^2 — both past
        # the 16 MB budget. The two-call form keeps each input at half
        # that and is the only layout that fits.)
        p0 = (plane_conv(sp, k0[:, :, :cs], mask, H, W, geo)
              + plane_conv(xp, k0[:, :, cs:], mask, H, W, geo)).astype(dtype)
        if eval_affine is None:
            s0, sq0 = masked_stats_per_sample(p0, mask)
    elif eval_affine is None:
        p0, s0, sq0 = plane_conv_stats(xp, k0, mask, H, W, geo)
    else:
        p0 = plane_conv(xp, k0, mask, H, W, geo).astype(dtype)
    if eval_affine is None:
        mv0 = _group_mv(s0, sq0, groups, hw)
        a0, b0 = _broadcast_affine(mv0, affine0[0], affine0[1], groups, eps)
    else:
        mv0 = mv1 = None
        (a0, b0), (a1, b1) = eval_affine
    h0 = apply_bn_relu_planes(p0, a0, b0, mask)
    if eval_affine is None:
        p1, s1, sq1 = plane_conv_stats(h0, k1, mask, H, W, geo)
        mv1 = _group_mv(s1, sq1, groups, hw)
        a1, b1 = _broadcast_affine(mv1, affine1[0], affine1[1], groups, eps)
    else:
        p1 = plane_conv(h0, k1, mask, H, W, geo).astype(dtype)
    h1 = apply_bn_relu_planes(p1, a1, b1, mask)
    if plane_out:
        return h1, (mv0, mv1)
    return from_planes(h1, H, W, geo), (mv0, mv1)


# --- plane-layout pooling / pointwise ops (stage chaining glue) ----------

def _plane_interior(xp: jnp.ndarray, H: int, W: int,
                    geo: PlaneGeo) -> jnp.ndarray:
    """Guarded planes [B, C, Lbuf] -> interior [B, C, H, W] (still
    channel-sublane-major; no NHWC transpose). The row split is a free
    bitcast when ``geo.rs`` is 128-aligned."""
    B, C, _ = xp.shape
    core = xp[:, :, geo.mb:geo.mb + geo.P].reshape(B, C, H + 2, geo.rs)
    return core[:, :, 1:H + 1, 1:W + 1]


def _pool_core(xp: jnp.ndarray, H: int, W: int, geo_in: PlaneGeo):
    """Shared 2x2/stride-2 max core: guarded planes -> pooled interior
    [B, C, H/2, W/2] via stride-2 slices (the layout that measured fastest
    FORWARD — see the round-3 strided-slice rewrite)."""
    B, C, _ = xp.shape
    v = xp[:, :, geo_in.mb:geo_in.mb + geo_in.P].reshape(B, C, H + 2,
                                                         geo_in.rs)
    rows = jnp.maximum(v[:, :, 1:H + 1:2], v[:, :, 2:H + 2:2])
    return jnp.maximum(rows[:, :, :, 1:W + 1:2], rows[:, :, :, 2:W + 2:2])


def _pool_vjp_enabled() -> bool:
    """The AD transpose of the stride-2 slice max turns into XLA scatter-add
    fusions + layout copies (~1.1 ms/step in the round-3 post-fused-opt
    trace). The hand-written backward below rebuilds the input-plane
    cotangent with pair-interleave stack/reshape instead.
    CONTRASTYOU_PLANE_POOLVJP=0 restores the AD transpose (A/B knob)."""
    import os
    return perf_knob("PLANE_POOLVJP") != "0"


def _balanced_max_split(a: jnp.ndarray, b: jnp.ndarray, g: jnp.ndarray):
    """Transpose of jnp.maximum(a, b): g to the larger side, split evenly
    at exact ties — matches lax's _balanced_eq so the custom pool backward
    is bit-identical to the AD transpose it replaces."""
    ga = jnp.where(a == b, g * jnp.asarray(0.5, g.dtype),
                   jnp.where(a > b, g, jnp.zeros_like(g)))
    return ga, g - ga


def _pool_bwd_planes(xp: jnp.ndarray, g_p: jnp.ndarray, H: int, W: int,
                     geo_in: PlaneGeo) -> jnp.ndarray:
    """Cotangent of :func:`_pool_core`: pooled-interior grad [B,C,H/2,W/2]
    -> guarded input planes [B, C, Lbuf_in]. Recomputes the two max
    operands from ``xp`` (cheap VPU slices), routes the gradient with
    balanced tie-splitting, and materializes the stride-2 placement as
    pair-interleave reshapes (contiguous in row-major; no scatter)."""
    B, C, _ = xp.shape
    Ho, Wo = H // 2, W // 2
    v = xp[:, :, geo_in.mb:geo_in.mb + geo_in.P].reshape(B, C, H + 2,
                                                         geo_in.rs)
    ra = v[:, :, 1:H + 1:2]
    rb = v[:, :, 2:H + 2:2]
    rows = jnp.maximum(ra, rb)
    ca = rows[:, :, :, 1:W + 1:2]
    cb = rows[:, :, :, 2:W + 2:2]
    gca, gcb = _balanced_max_split(ca, cb, g_p)
    g_rows = jnp.stack([gca, gcb], -1).reshape(B, C, Ho, W)
    g_rows = jnp.pad(g_rows, ((0, 0), (0, 0), (0, 0),
                              (1, geo_in.rs - W - 1)))
    gra, grb = _balanced_max_split(ra, rb, g_rows)
    g_v = jnp.stack([gra, grb], 3).reshape(B, C, H, geo_in.rs)
    g_v = jnp.pad(g_v, ((0, 0), (0, 0), (1, 1), (0, 0)))
    g_v = g_v.reshape(B, C, geo_in.P)
    return jnp.pad(g_v, ((0, 0), (0, 0),
                         (geo_in.mb, geo_in.lbuf - geo_in.P - geo_in.mb)))


def _plane_maxpool_impl(xp: jnp.ndarray, H: int, W: int, geo_in: PlaneGeo,
                        geo_out: PlaneGeo) -> jnp.ndarray:
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    B, C, _ = xp.shape
    Ho, Wo = H // 2, W // 2
    p = _pool_core(xp, H, W, geo_in)
    pp = jnp.pad(p, ((0, 0), (0, 0), (1, 1), (1, geo_out.rs - Wo - 1)))
    pp = pp.reshape(B, C, geo_out.P)
    return jnp.pad(pp, ((0, 0), (0, 0),
                        (geo_out.mb, geo_out.lbuf - geo_out.P - geo_out.mb)))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _plane_maxpool_cv(xp, H, W, geo_in, geo_out):
    return _plane_maxpool_impl(xp, H, W, geo_in, geo_out)


def _pmp_fwd(xp, H, W, geo_in, geo_out):
    return _plane_maxpool_impl(xp, H, W, geo_in, geo_out), xp


def _pmp_bwd(H, W, geo_in, geo_out, xp, g):
    B, C, _ = xp.shape
    Ho, Wo = H // 2, W // 2
    gc = g[:, :, geo_out.mb:geo_out.mb + geo_out.P]
    gc = gc.reshape(B, C, Ho + 2, geo_out.rs)
    g_p = gc[:, :, 1:Ho + 1, 1:Wo + 1]
    return (_pool_bwd_planes(xp, g_p, H, W, geo_in),)


_plane_maxpool_cv.defvjp(_pmp_fwd, _pmp_bwd)


def plane_maxpool(xp: jnp.ndarray, H: int, W: int, geo_in: PlaneGeo,
                  geo_out: PlaneGeo) -> jnp.ndarray:
    """2x2/stride-2 max-pool entirely in plane layout: [B, C, Lbuf_in] at
    (H, W) -> guarded planes [B, C, Lbuf_out] at (H/2, W/2). Replaces the
    from_planes -> nn.max_pool -> to_planes round-trip between chained
    plane stages (two full channel<->spatial transposes of the wide
    activations) with lane-local reshapes/max/pads. Backward is a custom
    scatter-free VJP (see :func:`_pool_vjp_enabled`)."""
    if _pool_vjp_enabled():
        return _plane_maxpool_cv(xp, H, W, geo_in, geo_out)
    return _plane_maxpool_impl(xp, H, W, geo_in, geo_out)


def _plane_maxpool_to_nhwc_impl(xp: jnp.ndarray, H: int, W: int,
                                geo: PlaneGeo) -> jnp.ndarray:
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    return _pool_core(xp, H, W, geo).transpose(0, 2, 3, 1)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _plane_maxpool_to_nhwc_cv(xp, H, W, geo):
    return _plane_maxpool_to_nhwc_impl(xp, H, W, geo)


def _pmpn_fwd(xp, H, W, geo):
    return _plane_maxpool_to_nhwc_impl(xp, H, W, geo), xp


def _pmpn_bwd(H, W, geo, xp, g):
    return (_pool_bwd_planes(xp, g.transpose(0, 3, 1, 2), H, W, geo),)


_plane_maxpool_to_nhwc_cv.defvjp(_pmpn_fwd, _pmpn_bwd)


def plane_maxpool_to_nhwc(xp: jnp.ndarray, H: int, W: int,
                          geo: PlaneGeo) -> jnp.ndarray:
    """2x2/stride-2 max-pool from planes at (H, W) straight to NHWC
    [B, H/2, W/2, C] — for a plane-stage output feeding an XLA conv level.
    The channel<->spatial transpose happens AFTER pooling (4x fewer
    bytes than from_planes at full resolution followed by nn.max_pool).
    Backward is a custom scatter-free VJP (see :func:`_pool_vjp_enabled`)."""
    if _pool_vjp_enabled():
        return _plane_maxpool_to_nhwc_cv(xp, H, W, geo)
    return _plane_maxpool_to_nhwc_impl(xp, H, W, geo)


def conv1x1_from_planes(xp: jnp.ndarray, kernel: jnp.ndarray,
                        bias: Optional[jnp.ndarray], H: int, W: int,
                        geo: PlaneGeo) -> jnp.ndarray:
    """1x1 conv applied IN plane layout, then converted: [B, Cin, Lbuf] x
    [Cin, Cout] -> NHWC [B, H, W, Cout]. For the U-Net's Deconv_1x1 head on
    a chained plane stage the final transpose moves Cout/Cin times fewer
    bytes (4 classes vs 32 channels). Guard/border lanes of ``xp`` are zero
    (plane stages mask their outputs) and from_planes drops them anyway."""
    y = jnp.einsum("bcl,co->bol", xp, kernel.astype(xp.dtype))
    out = from_planes(y, H, W, geo)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# --- generalized tap-set conv + parity-decomposed UpConv -----------------

def fold_taps(kernel: jnp.ndarray) -> jnp.ndarray:
    """[T, Cin, Cout] tap-major kernel -> [Cout, T*Cin] (the w2 layout the
    plane kernel's patches scratch expects)."""
    T, cin, cout = kernel.shape
    return kernel.transpose(2, 0, 1).reshape(cout, T * cin)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def plane_conv_taps_stats(xp: jnp.ndarray, kernel: jnp.ndarray,
                          mask: jnp.ndarray, H: int, W: int, geo: PlaneGeo,
                          offsets: Tuple[int, ...]):
    """Arbitrary-tap-set plane conv (kernel [T, Cin, Cout], static lane
    ``offsets``) with the kernel's free masked per-sample (sum, sumsq)
    stat partials — the generalized sibling of :func:`plane_conv_stats`
    used by the parity-decomposed UpConv kernels."""
    out, part = conv_plane_geo(xp, fold_taps(kernel), mask, H, W, geo=geo,
                               offsets=offsets)
    out = jnp.where(mask[None] > 0, out, 0).astype(xp.dtype)
    s = part.sum(1)                                         # [B, 2, C] f32
    return out, s[:, 0], s[:, 1]


def _pcts_fwd(xp, kernel, mask, H, W, geo, offsets):
    out, ssum, ssq = plane_conv_taps_stats(xp, kernel, mask, H, W, geo,
                                           offsets)
    return (out, ssum, ssq), (xp, kernel, mask, out)


def _pcts_bwd(H, W, geo, offsets, res, cot):
    xp, kernel, mask, out = res
    g_out, g_s, g_sq = cot
    g = (g_out.astype(jnp.float32)
         + mask[None] * (g_s[:, :, None]
                         + 2.0 * out.astype(jnp.float32)
                         * g_sq[:, :, None]))
    g = jnp.where(mask[None] > 0, g, 0).astype(xp.dtype)
    # dx: transposed conv = same tap kernel with NEGATED offsets and
    # swapped in/out channels (tap order preserved).
    neg = tuple(-o for o in offsets)
    dxp, _ = conv_plane_geo(g, fold_taps(kernel.transpose(0, 2, 1)), mask,
                            H, W, geo=geo, offsets=neg)
    dxp = jnp.where(mask[None] > 0, dxp, 0).astype(xp.dtype)
    # dk[t,i,o] = sum_{b,m} xp[b,i,m+off_t] * g[b,o,m] on the real plane
    if _dw_enabled(xp.shape[0]):
        dk = plane_conv_dw(xp, g, geo, offsets)
    else:
        # bf16 operands + f32 accumulation (see _plane_conv_bwd)
        gs = g[:, :, geo.mb:geo.mb + geo.P]
        dks = []
        for off in offsets:
            xs = jax.lax.dynamic_slice_in_dim(xp, geo.mb + off, geo.P, 2)
            dks.append(jnp.einsum("bim,bom->io", xs, gs,
                                  preferred_element_type=jnp.float32))
        dk = jnp.stack(dks, 0)
    return dxp, dk.astype(kernel.dtype), None


plane_conv_taps_stats.defvjp(_pcts_fwd, _pcts_bwd)


def _parity_taps(k3: jnp.ndarray, a: int, b: int, rs: int):
    """Fold a [3,3,Cin,Cout] HWIO kernel into the 2x2 tap set producing the
    (a, b) output-parity class of ``conv3x3_SAME(upsample2x_nearest(x))``.

    Derivation: out(2y+a, 2x+b) = sum_{dy,dx} k[dy,dx] * x((2y+a+dy-1)//2,
    (2x+b+dx-1)//2) — for each parity the three dy (dx) values collapse
    onto TWO input rows (cols), so the 9 taps fold into 4 taps whose
    weights are sums of k's rows/cols. Returns (taps [4, Cin, Cout],
    lane offsets) with row/col offsets {-1,0} for parity 0 and {0,+1} for
    parity 1."""
    rows = ((-1, k3[0]), (0, k3[1] + k3[2])) if a == 0 else \
           ((0, k3[0] + k3[1]), (1, k3[2]))              # [(off, [3,Ci,Co])]
    taps, offs = [], []
    for dy, kr in rows:
        cols = ((-1, kr[0]), (0, kr[1] + kr[2])) if b == 0 else \
               ((0, kr[0] + kr[1]), (1, kr[2]))
        for dx, kc in cols:
            taps.append(kc)                              # [Cin, Cout]
            offs.append(dy * rs + dx)
    return jnp.stack(taps, 0), tuple(offs)


def _upvjp_enabled() -> bool:
    """Custom backward for the upconv interleave (CONTRASTYOU_PLANE_UPVJP,
    default 1): the AD transpose of the two-phase zip fragments into ~95
    small re-tiling ops (~2.4 ms/step in the round-3 post-crop trace); the
    hand-written backward uses stride-2 sublane/lane slices instead (the
    same trick as the strided plane_maxpool rewrite). Bit-identical (pure
    permutation either way)."""
    import os
    return perf_knob("PLANE_UPVJP") != "0"


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def upconv_interleave(o00: jnp.ndarray, o01: jnp.ndarray, o10: jnp.ndarray,
                      o11: jnp.ndarray, H: int, W: int,
                      geo_in: PlaneGeo, geo_out: PlaneGeo) -> jnp.ndarray:
    """Four parity-class conv output planes [B, C, Lbuf_in] at (H, W) ->
    interleaved (2H, 2W) guarded planes [B, C, Lbuf_out] (the upconv_plane
    ILV2 glue: interior extraction + row/column parity zips + guard pads),
    with a hand-written transpose (:func:`_upvjp_enabled`)."""
    B, C, _ = o00.shape
    quads = [[_plane_interior(o00, H, W, geo_in),
              _plane_interior(o01, H, W, geo_in)],
             [_plane_interior(o10, H, W, geo_in),
              _plane_interior(o11, H, W, geo_in)]]
    za = [jnp.stack((r0, r1), axis=-1).reshape(B, C, H, 2 * W)
          for r0, r1 in quads]
    q = jnp.stack(za, axis=-2).reshape(B, C, 2 * H, 2 * W)
    qp = jnp.pad(q, ((0, 0), (0, 0), (1, 1), (1, geo_out.rs - 2 * W - 1)))
    qp = qp.reshape(B, C, geo_out.P)
    return jnp.pad(qp, ((0, 0), (0, 0),
                        (geo_out.mb, geo_out.lbuf - geo_out.P - geo_out.mb)))


def _upconv_ilv_fwd(o00, o01, o10, o11, H, W, geo_in, geo_out):
    return upconv_interleave(o00, o01, o10, o11, H, W, geo_in, geo_out), None


def _upconv_ilv_bwd(H, W, geo_in, geo_out, _, g):
    B, C, _ = g.shape
    core = g[:, :, geo_out.mb:geo_out.mb + geo_out.P]
    core = core.reshape(B, C, 2 * H + 2, geo_out.rs)[:, :, 1:2 * H + 1,
                                                     1:2 * W + 1]
    gz0 = core[:, :, 0::2]                       # row parity (sublane)
    gz1 = core[:, :, 1::2]

    def back(gi):                                # transpose of interior
        v = jnp.pad(gi, ((0, 0), (0, 0), (1, 1),
                         (1, geo_in.rs - W - 1)))
        v = v.reshape(B, C, geo_in.P)
        return jnp.pad(v, ((0, 0), (0, 0),
                           (geo_in.mb, geo_in.lbuf - geo_in.P - geo_in.mb)))

    return (back(gz0[:, :, :, 0::2]), back(gz0[:, :, :, 1::2]),
            back(gz1[:, :, :, 0::2]), back(gz1[:, :, :, 1::2]))


upconv_interleave.defvjp(_upconv_ilv_fwd, _upconv_ilv_bwd)


def upconv_plane(xp: jnp.ndarray, k3: jnp.ndarray, H: int, W: int,
                 geo_in: PlaneGeo, geo_out: PlaneGeo):
    """``conv3x3_SAME(upsample2x_nearest(x))`` entirely in plane layout:
    input planes [B, Cin, Lbuf_in] at (H, W) -> preactivation planes
    [B, Cout, Lbuf_out] at (2H, 2W) plus masked per-sample (sum, sumsq)
    stats of the full output (for the UpConv BN).

    Four quarter-resolution 2x2-tap plane convs (one per output-parity
    class, :func:`_parity_taps`) + a lane-local interleave — 4/9 of the
    MACs of a 3x3 conv at the upsampled resolution, no NHWC round-trip,
    and the output lands directly in the consumer stage's geometry.
    Differentiable end-to-end: the parity convs carry the generalized
    custom VJP; folding and interleave are plain XLA.

    Matches models/unet.py ``conv3x3_on_upsampled`` (ref: arch/unet.py:34-47
    up_conv) up to dtype rounding."""
    import os
    B, cin, _ = xp.shape
    cout = k3.shape[-1]
    mask_in = border_mask(H, W, geo_in)
    raw, ssum, ssq = [], 0.0, 0.0
    for a in (0, 1):
        for b in (0, 1):
            taps, offs = _parity_taps(k3, a, b, geo_in.rs)
            o, s, sq = plane_conv_taps_stats(xp, taps, mask_in, H, W,
                                             geo_in, offs)
            ssum, ssq = ssum + s, ssq + sq
            raw.append(o)
    ilv2 = perf_knob("PLANE_ILV2") != "0"
    if ilv2 and _upvjp_enabled():
        # custom-transpose form (stride-2 slice backward)
        out = upconv_interleave(raw[0], raw[1], raw[2], raw[3],
                                H, W, geo_in, geo_out)
        return out, ssum, ssq
    quads = [[_plane_interior(raw[0], H, W, geo_in),
              _plane_interior(raw[1], H, W, geo_in)],
             [_plane_interior(raw[2], H, W, geo_in),
              _plane_interior(raw[3], H, W, geo_in)]]
    if ilv2:
        # two-phase interleave (on-chip A/B: 17.41 -> 16.12 ms whole-model
        # fwd+bwd vs the 6-D transpose): one lane zip per row parity (the
        # only genuinely re-tiling copy), then a near-free sublane row zip.
        za = [jnp.stack((r0, r1), axis=-1).reshape(B, cout, H, 2 * W)
              for r0, r1 in quads]
        q = jnp.stack(za, axis=-2).reshape(B, cout, 2 * H, 2 * W)
    else:
        q = jnp.stack([jnp.stack(r, 0) for r in quads], 0)  # [a,b,B,Co,H,W]
        q = q.transpose(2, 3, 4, 0, 5, 1).reshape(B, cout, 2 * H, 2 * W)
    qp = jnp.pad(q, ((0, 0), (0, 0), (1, 1), (1, geo_out.rs - 2 * W - 1)))
    qp = qp.reshape(B, cout, geo_out.P)
    out = jnp.pad(qp, ((0, 0), (0, 0),
                       (geo_out.mb, geo_out.lbuf - geo_out.P - geo_out.mb)))
    return out, ssum, ssq


def use_plane_upconv(features: int, cin: int, spatial_in: Tuple[int, int],
                     dtype=jnp.bfloat16, tag: str = "") -> bool:
    """Gate for the parity-decomposed plane UpConv: same env/backend policy
    as :func:`models.unet.use_pallas_stage`, evaluated on the INPUT spatial
    size (the parity convs run at input resolution; max tap offset is W+3
    like the 3x3 stencil).

    ``CONTRASTYOU_PLANE_UPCONV``: "0" disables, "1" enables every eligible
    UpConv, or a comma list of level tags enabling only those. The default
    is "up2": the on-chip per-level A/B (BENCH_NOTES round 3) measured the
    wide Up2 level (112^2 -> 224^2, Cin=64) 0.23 ms/step FASTER and the
    deeper Up3 level (Cin=128) 0.75 ms/step SLOWER than the
    NHWC-interleaved XLA formulation."""
    import os
    H, W = spatial_in
    try:
        geo = pick_geometry(H, W, max(cin, features),
                            jnp.dtype(dtype).itemsize)
    except ValueError:
        return False
    fits = dtype == jnp.bfloat16 or geo.P <= 20000
    eligible = fits and (geo.rs + 1 <= geo.pad)
    knob = perf_knob("PLANE_UPCONV")
    if knob == "0":
        return False                      # A/B knob (measured on-chip)
    if knob != "1" and tag not in knob.split(","):
        return False
    raw = perf_knob("PALLAS_CONV")
    if raw == "0":
        return False
    if raw == "1":
        return eligible
    return jax.default_backend() == "tpu" and eligible


def use_parity_chain(cin_img: int, c1: int, cu2: int,
                     spatial: Tuple[int, int],
                     dtype=jnp.bfloat16, fwd_only: bool = False) -> bool:
    """Gate for the parity-domain widest-level chain (see the section
    comment below): env/backend policy plus feasibility — the stacked
    4-parity planes of the widest stage must fit one VMEM input block and
    the backward pass needs 8-aligned cotangent channel blocks.

    ``CONTRASTYOU_PLANE_PARITY``: default ON for BOTH directions since
    round 4 — under the lbuf-weighted geometry (PLANE_GEOCOST auto) the
    quarter-geometry guard padding that made the round-3 train chain lose
    (16.28 vs 15.56 ms; lbuf/P = 1.42 at the legacy mb=2048 pick) drops
    to 1.18 at mb=1024 and the parity train chain WINS: 14.63 vs 15.01 ms
    whole-model fwd+bwd (224^2 batch 10), bench 357.3 -> 367.1 slices/s.
    Forward-only it was already a win in round 3 (6.62 vs 7.20 ms).
    "fwd" restores the round-3 policy (fwd-only passes), "0" disables
    both directions. ``CONTRASTYOU_PALLAS_CONV=1`` runs it on CPU in
    interpret mode (tests)."""
    import os
    H, W = spatial
    if H % 2 or W % 2 or c1 % 8 or cu2 % 8:
        return False
    Hq, Wq = H // 2, W // 2
    itemsize = jnp.dtype(dtype).itemsize
    try:
        geo = pick_geometry(Hq, Wq, max(c1, cu2), itemsize)
    except ValueError:
        return False
    if geo.rs + 1 > geo.pad:                 # parity taps reach rs+1
        return False
    cmax = max(cin_img * _parity_crep(cin_img), c1, cu2)
    # stacked 4-parity input block + patches scratch residency
    if (4 * cmax * geo.lbuf + 9 * cmax * geo.mb) * itemsize > (14 << 20):
        return False
    knob = perf_knob("PLANE_PARITY") or "1"
    if knob != "1" and not (fwd_only and knob == "fwd"):
        return False
    raw = perf_knob("PALLAS_CONV")
    if raw == "0":
        return False
    if raw == "1":
        return True
    return jax.default_backend() == "tpu"


# --- parity-domain 224^2 chain (round 3) --------------------------------
#
# Keep the four 2x2-parity classes of the widest U-Net level as separate
# quarter-resolution plane arrays [B, 4, C, Lbuf] (plane q = 2*row_par +
# col_par holds img[2y+row_par, 2x+col_par]) instead of one interleaved
# 224^2 plane. A 3x3 conv on the interleaved image decomposes EXACTLY into
# four parity-output convs whose 9 taps each read ONE parity plane at ONE
# quarter-lane offset (the ``blocks`` kernel extension) — same MACs, same
# patches scratch — while the interleave/deinterleave glue this replaces
# (the Up2 lane zips, the pool stride-2 slices, to_planes at 226^2: ~3.5
# ms/step in the round-3 trace) disappears: max-pool becomes an elementwise
# max over the parity axis, the upconv's parity outputs feed the consumer
# directly, and the only interleave left is the num_classes-wide head.


def parity_tap_plan(a: int, b: int, rs: int):
    """(blocks, offsets) of the 9 taps producing output parity (a, b):
    out[2Y+a, 2X+b] = sum_{dy,dx} k[dy,dx] * img[2Y+a+dy-1, 2X+b+dx-1] and
    img[2Y+u] lives in plane row-parity u&1 at quarter row Y + (u>>1)."""
    blocks, offs = [], []
    for dy in range(3):
        for dx in range(3):
            u, v = a + dy - 1, b + dx - 1
            blocks.append(2 * (u & 1) + (v & 1))
            offs.append((u >> 1) * rs + (v >> 1))
    return tuple(blocks), tuple(offs)


def _parity_crep(cin: int) -> int:
    """Replication factor making the per-block patch rows 8-aligned (the
    multi kernel slices the stacked parity planes at sublane offsets,
    which Mosaic requires 8-aligned)."""
    import math
    return 8 // math.gcd(cin, 8)


def _multi_w2(plan, kts, order=None):
    """Build the multi-kernel operands from a tap plan.

    ``plan``: tuple over output blocks q of (tap, in_block, lane_offset)
    triples; ``kts``: per-output-block tap weights [T_q, cin, cout];
    ``order``: optional explicit ((in_block, offset), ...) group ordering
    (kept deterministic so the lru-cached pallas wrappers hit). Returns
    (groups, w2 [Q*cout, G*cin]) with zeros where an output block has no
    tap in a group."""
    if order is not None:
        groups = list(order)
        gidx = {g: i for i, g in enumerate(groups)}
    else:
        groups, gidx = [], {}
        for entries in plan:
            for (_t, bl, off) in entries:
                if (bl, off) not in gidx:
                    gidx[(bl, off)] = len(groups)
                    groups.append((bl, off))
    G = len(groups)
    rows = []
    for entries, kt in zip(plan, kts):
        T, cinr, cout = kt.shape
        sel = np.zeros((G, T), np.float32)
        for (t, bl, off) in entries:
            sel[gidx[(bl, off)], t] += 1.0
        w = jnp.einsum("gt,tio->ogi", jnp.asarray(sel), kt)
        rows.append(w.reshape(cout, G * cinr))
    return tuple(groups), jnp.concatenate(rows, 0)


def _transpose_plan(plan, nb_in: int):
    """Transpose of a multi tap plan: per INPUT block, the taps that read
    each stacked output-cotangent block at the negated offset. Returns
    (plan_T, kt_map) with kt_map[b][j] = (q, t) naming the forward weight
    whose transpose tap j of input block b uses."""
    plan_T, kt_map = [], []
    for bl in range(nb_in):
        entries, kmap = [], []
        for q, ents in enumerate(plan):
            for (t, bl2, off) in ents:
                if bl2 == bl:
                    entries.append((len(entries), q, -off))
                    kmap.append((q, t))
        plan_T.append(tuple(entries))
        kt_map.append(tuple(kmap))
    return tuple(plan_T), tuple(kt_map)


def _pcms_impl(xp, kts, mask, H, W, geo, plan, order):
    cinr = kts[0].shape[1]
    groups, w2 = _multi_w2(plan, kts, order)
    if max(abs(off) for _, off in groups) > geo.pad:
        raise ValueError(
            f"multi plane conv offsets exceed the halo pad={geo.pad}")
    crows = xp.shape[1]
    nb = crows // cinr
    f = _partitioned_conv(geo.rs, False, str(jnp.dtype(xp.dtype)),
                          geo.mb, geo.pad, None, False, tuple(groups), nb)
    a = jnp.ones((crows, 1), jnp.float32)
    b = jnp.zeros((crows, 1), jnp.float32)
    out, part = f(xp, w2.astype(xp.dtype), a, b, mask)
    out = jnp.where(mask[None] > 0, out, 0).astype(xp.dtype)
    s = part.sum(1)                                         # [B, 2, Q*C]
    return out, s[:, 0], s[:, 1]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def plane_conv_multi_stats(xp: jnp.ndarray, kts, mask: jnp.ndarray,
                           H: int, W: int, geo: PlaneGeo, spec):
    """ONE multi-block plane conv producing ALL output blocks of a static
    tap plan (see :func:`_multi_w2`), plus the masked per-sample
    (sum, sumsq) [B, Q*cout] of each output block — the workhorse of the
    parity-domain chain: the stacked input is loaded once per grid step
    for every output parity (the earlier per-output-parity calls re-read
    it four times, measured 22.17 vs 15.60 ms whole-model).

    ``spec`` = (plan, order_F, order_T[, want_stats]): the plan plus the
    forward / dx group orderings (shared orderings let the lru-cached
    pallas wrappers be reused across directions). ``want_stats=False``
    returns only ``out`` AND — the real point — skips the backward's
    stats-cotangent assembly (g_s/g_sq fold over the full f32 planes,
    ~4 memory passes that profile as pure overhead when the caller
    discards the stats, e.g. the skip-split conv0). Backward: dx is the
    TRANSPOSED plan through the same kernel (:func:`_transpose_plan`); dk
    is one sliced einsum per plan entry. ``cout`` must be 8-aligned
    (cotangent block slicing)."""
    plan, order_F = spec[0], spec[1]
    res = _pcms_impl(xp, kts, mask, H, W, geo, plan, order_F)
    return res if _spec_stats(spec) else res[0]


def _spec_stats(spec) -> bool:
    return spec[3] if len(spec) > 3 else True


def _pcms_fwd(xp, kts, mask, H, W, geo, spec):
    plan, order_F = spec[0], spec[1]
    out, s, sq = _pcms_impl(xp, kts, mask, H, W, geo, plan, order_F)
    if _spec_stats(spec):
        return (out, s, sq), (xp, kts, mask, out)
    return out, (xp, kts, mask, out)


def _pcms_bwd(H, W, geo, spec, res, cot):
    plan, order_T = spec[0], spec[2]
    xp, kts, mask, out = res
    B, crows, L = xp.shape
    cinr, cout = kts[0].shape[1], kts[0].shape[2]
    nb = crows // cinr
    Q = len(plan)
    assert cout % 8 == 0, cout               # cotangent block slicing
    if _spec_stats(spec):
        g_out, g_s, g_sq = cot
        g = (g_out.astype(jnp.float32)
             + mask[None] * (g_s[:, :, None]
                             + 2.0 * out.astype(jnp.float32)
                             * g_sq[:, :, None]))
        g = jnp.where(mask[None] > 0, g, 0).astype(xp.dtype)
    else:
        g = jnp.where(mask[None] > 0, cot, 0).astype(xp.dtype)
    plan_T, kt_map = _transpose_plan(plan, nb)
    ktsT = tuple(jnp.stack([kts[q][t].transpose(1, 0) for (q, t) in kmap], 0)
                 for kmap in kt_map)
    dxp = _pcms_impl(g, ktsT, mask, H, W, geo, plan_T, order_T)[0]
    dkts = []
    if _dw_enabled(B):
        # Pallas dW per (parity, input-block) group: patches built once in
        # VMEM per block, taps merged into the dot's M dim — the einsum
        # form is layout-bound (r5 scripts_perf_dw: 11.4 vs 6.8 ms at
        # pretrain batch 96)
        for q, entries in enumerate(plan):
            slots = [None] * kts[q].shape[0]
            bygroup: dict = {}
            for (t, bl, off) in entries:
                bygroup.setdefault(bl, []).append((t, off))
            gq = g[:, q * cout:(q + 1) * cout, :]
            for bl, touts in bygroup.items():
                offs = tuple(off for (_, off) in touts)
                dk = plane_conv_dw(xp[:, bl * cinr:(bl + 1) * cinr], gq,
                                   geo, offs)
                for k, (t, _) in enumerate(touts):
                    slots[t] = dk[k] if slots[t] is None else slots[t] + dk[k]
            dkts.append(jnp.stack(
                [s if s is not None else jnp.zeros((cinr, cout), jnp.float32)
                 for s in slots], 0).astype(kts[q].dtype))
        return dxp, tuple(dkts), None
    # dk: one quarter-size sliced einsum per plan entry
    gcore = [g[:, q * cout:(q + 1) * cout,
               geo.mb:geo.mb + geo.P]
             for q in range(Q)]
    for q, entries in enumerate(plan):
        slots = [None] * kts[q].shape[0]
        for (t, bl, off) in entries:
            xs = jax.lax.dynamic_slice_in_dim(
                xp[:, bl * cinr:(bl + 1) * cinr], geo.mb + off, geo.P, 2)
            dt = jnp.einsum("bil,bol->io", xs, gcore[q],
                            preferred_element_type=jnp.float32)
            slots[t] = dt if slots[t] is None else slots[t] + dt
        dkts.append(jnp.stack(
            [s if s is not None else jnp.zeros((cinr, cout), jnp.float32)
             for s in slots], 0).astype(kts[q].dtype))
    return dxp, tuple(dkts), None


plane_conv_multi_stats.defvjp(_pcms_fwd, _pcms_bwd)


def _parity_group_order(rs: int):
    """Canonical (block, offset) ordering of the 16 parity-conv groups —
    u-major, v-minor over the full-resolution tap coordinates — shared by
    the forward and (by flip symmetry) dx plans so the lru-cached pallas
    wrappers are reused across both directions."""
    return tuple((2 * (u & 1) + (v & 1), (u >> 1) * rs + (v >> 1))
                 for u in (-1, 0, 1, 2) for v in (-1, 0, 1, 2))


def parity_conv3x3_stats(xq: jnp.ndarray, k3: jnp.ndarray, mask: jnp.ndarray,
                         H: int, W: int, geo: PlaneGeo,
                         with_stats: bool = True):
    """3x3 SAME conv in the parity domain: parity planes [B, 4, Cin, Lbuf]
    at quarter resolution (H, W) x HWIO ``k3`` -> parity preactivations
    [B, 4, Cout, Lbuf] plus the masked per-sample (sum, sumsq) [B, Cout] of
    the FULL-resolution output — ONE fused kernel pass over the stacked
    parity planes (:func:`plane_conv_multi_stats`). Numerically identical
    (up to accumulation order) to interleave -> plane_conv_stats ->
    deinterleave. ``with_stats=False`` returns only the preactivations and
    skips the stats-cotangent assembly in backward (for callers that
    reduce their own stats, e.g. the skip-split conv0).
    Ref semantics: arch/unet.py:16-31."""
    B, nbq, cin, L = xq.shape
    assert nbq == 4, xq.shape
    cout = k3.shape[-1]
    crep = _parity_crep(cin)
    xs, k = xq, k3
    if crep > 1:
        xs = jnp.repeat(xq, crep, axis=2)
        k = jnp.repeat(k3, crep, axis=2) / crep
    cinr = cin * crep
    flat = xs.reshape(B, 4 * cinr, L)
    kt = k.reshape(9, cinr, cout)
    plan = []
    for q in range(4):
        blocks, offs = parity_tap_plan(q // 2, q % 2, geo.rs)
        plan.append(tuple((t, blocks[t], offs[t]) for t in range(9)))
    order = _parity_group_order(geo.rs)
    if not with_stats:
        out = plane_conv_multi_stats(flat, (kt,) * 4, mask, H, W, geo,
                                     (tuple(plan), order, order, False))
        return out.reshape(B, 4, cout, L)
    out, s, sq = plane_conv_multi_stats(flat, (kt,) * 4, mask, H, W, geo,
                                        (tuple(plan), order, order))
    outs = out.reshape(B, 4, cout, L)
    return (outs, s.reshape(B, 4, cout).sum(1),
            sq.reshape(B, 4, cout).sum(1))


def parity_split_to_planes(x: jnp.ndarray, dtype, geo: PlaneGeo):
    """NHWC [B, 2H, 2W, C] -> parity planes [B, 4, C, Lbuf] at (H, W)."""
    qs = [to_planes(x[:, a::2, b::2, :], dtype, geo)
          for a in (0, 1) for b in (0, 1)]
    return jnp.stack(qs, 1)


def parity_pool(hq: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max-pool of the interleaved image == elementwise max
    over the parity planes — zero layout work, and the reduction tree
    (row parity first, then column parity) matches plane_maxpool exactly
    so gradients agree bit-for-bit. Output: dense planes [B, C, Lbuf] in
    the SAME quarter geometry (which is the next level's plane layout)."""
    rows0 = jnp.maximum(hq[:, 0], hq[:, 2])
    rows1 = jnp.maximum(hq[:, 1], hq[:, 3])
    return jnp.maximum(rows0, rows1)


def _apply_bn_relu_parity(xq, a, b, mask):
    """:func:`apply_bn_relu_planes` with a leading parity axis."""
    if a.ndim == 1:
        a, b = a[None, None, :, None], b[None, None, :, None]
    else:
        a, b = a[:, None, :, None], b[:, None, :, None]
    h = xq.astype(jnp.float32) * a + b
    h = jnp.maximum(h, 0.0)
    return jnp.where(mask[None, None] > 0, h, 0.0).astype(xq.dtype)


def _parity_masked_stats(pq, mask):
    """Masked per-(sample, channel) (sum, sumsq) over parity + plane."""
    v = jnp.where(mask[None, None] > 0, pq.astype(jnp.float32), 0.0)
    return v.sum((1, 3)), (v * v).sum((1, 3))


def parity_convblock_stage(xq, skipq, k0, k1, affine0, affine1, *,
                           eps: float, dtype, Hq: int, Wq: int,
                           geo: PlaneGeo,
                           bn_groups: Optional[Tuple[int, ...]] = None,
                           eval_affine=None):
    """:func:`convblock_stage` in the parity domain: parity planes in ->
    parity planes out, identical BN semantics (per-group batch statistics
    over the full-resolution output). ``skipq`` reproduces the decoder
    concat via two parity convs on slices of ``k0``. ``eval_affine``:
    inference-mode BN exactly as in :func:`convblock_stage` (returned mv
    lists are ``None``)."""
    B = xq.shape[0]
    mask = border_mask(Hq, Wq, geo)
    groups = tuple(bn_groups) if bn_groups else (B,)
    hw = 4 * Hq * Wq
    if skipq is not None:
        cs = skipq.shape[2]
        o_s = parity_conv3x3_stats(skipq, k0[:, :, :cs], mask,
                                   Hq, Wq, geo, with_stats=False)
        o_x = parity_conv3x3_stats(xq, k0[:, :, cs:], mask,
                                   Hq, Wq, geo, with_stats=False)
        p0 = (o_s + o_x).astype(dtype)
        if eval_affine is None:
            s0, sq0 = _parity_masked_stats(p0, mask)
    elif eval_affine is None:
        p0, s0, sq0 = parity_conv3x3_stats(xq, k0, mask, Hq, Wq, geo)
    else:
        p0 = parity_conv3x3_stats(xq, k0, mask, Hq, Wq, geo,
                                  with_stats=False).astype(dtype)
    if eval_affine is None:
        mv0 = _group_mv(s0, sq0, groups, hw)
        a0, b0 = _broadcast_affine(mv0, affine0[0], affine0[1], groups, eps)
    else:
        mv0 = mv1 = None
        (a0, b0), (a1, b1) = eval_affine
    h0 = _apply_bn_relu_parity(p0, a0, b0, mask)
    if eval_affine is None:
        p1, s1, sq1 = parity_conv3x3_stats(h0, k1, mask, Hq, Wq, geo)
        mv1 = _group_mv(s1, sq1, groups, hw)
        a1, b1 = _broadcast_affine(mv1, affine1[0], affine1[1], groups, eps)
    else:
        p1 = parity_conv3x3_stats(h0, k1, mask, Hq, Wq, geo,
                                  with_stats=False).astype(dtype)
    h1 = _apply_bn_relu_parity(p1, a1, b1, mask)
    return h1, (mv0, mv1)


def upconv_plane_parity(xp: jnp.ndarray, k3: jnp.ndarray, H: int, W: int,
                        geo_in: PlaneGeo):
    """:func:`upconv_plane` WITHOUT the interleave: the four parity-class
    convs stay as planes [B, 4, Cout, Lbuf_in] in the INPUT geometry —
    which IS the parity-domain quarter geometry of the (2H, 2W) output —
    and run as ONE fused kernel pass (:func:`plane_conv_multi_stats`, the
    input loaded once for all four parity outputs). Stats identical to
    upconv_plane (masked sums of the full output)."""
    B, cin, _ = xp.shape
    crep = _parity_crep(cin)
    xs, k = xp, k3
    if crep > 1:
        xs = jnp.repeat(xp, crep, axis=1)
        k = jnp.repeat(k3, crep, axis=2) / crep
    kts, plan = [], []
    for a in (0, 1):
        for b in (0, 1):
            taps, offs = _parity_taps(k, a, b, geo_in.rs)
            kts.append(taps)                         # [4, cin*crep, cout]
            plan.append(tuple((t, 0, offs[t]) for t in range(len(offs))))
    rs = geo_in.rs
    order_f = tuple((0, sr * rs + sc)
                    for sr in (-1, 0, 1) for sc in (-1, 0, 1))
    order_t = _parity_group_order(rs)       # dx: 4 cotangent blocks
    mask_in = border_mask(H, W, geo_in)
    out, s, sq = plane_conv_multi_stats(xs, tuple(kts), mask_in, H, W,
                                        geo_in,
                                        (tuple(plan), order_f, order_t))
    cout = k3.shape[-1]
    return (out.reshape(B, 4, cout, out.shape[-1]),
            s.reshape(B, 4, cout).sum(1), sq.reshape(B, 4, cout).sum(1))


def parity_head_to_nhwc(xq: jnp.ndarray, kernel: jnp.ndarray,
                        bias: Optional[jnp.ndarray], Hq: int, Wq: int,
                        geo: PlaneGeo) -> jnp.ndarray:
    """1x1 conv head on parity planes -> NHWC [B, 2H, 2W, K]: the ONLY
    interleave of the parity chain, paid at ``K`` (=num_classes) channels
    instead of the stage width (ref arch/unet.py:60 Conv_1x1)."""
    y = jnp.einsum("bpcl,co->bpol", xq, kernel.astype(xq.dtype))
    B, _, K, _ = y.shape
    core = y[:, :, :, geo.mb:geo.mb + geo.P].reshape(B, 4, K, Hq + 2, geo.rs)
    q = core[:, :, :, 1:Hq + 1, 1:Wq + 1]                 # [B, 4, K, Hq, Wq]
    z0 = jnp.stack((q[:, 0], q[:, 1]), -1).reshape(B, K, Hq, 2 * Wq)
    z1 = jnp.stack((q[:, 2], q[:, 3]), -1).reshape(B, K, Hq, 2 * Wq)
    full = jnp.stack((z0, z1), 3).reshape(B, K, 2 * Hq, 2 * Wq)
    out = full.transpose(0, 2, 3, 1)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def parity_enabled() -> bool:
    """CONTRASTYOU_PLANE_PARITY gates the parity-domain 224^2 chain
    (default ON on TPU after the round-3 on-chip A/B; =1 forces it on CPU
    — how the test suite covers it; =0 disables)."""
    import os
    raw = perf_knob("PLANE_PARITY")
    if raw == "0":
        return False
    if raw == "1":
        return True
    return jax.default_backend() == "tpu"


# --- conv WITH the kernel's free stat partials (differentiable) ---------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def plane_conv_stats(xp: jnp.ndarray, kernel: jnp.ndarray, mask: jnp.ndarray,
                     H: int, W: int, geo: Optional[PlaneGeo] = None):
    """Like :func:`plane_conv` but also returns the masked PER-SAMPLE
    per-channel (sum, sum-of-squares) [B, C] of the output — taken from the
    kernel's per-block partials, which are computed in-VMEM for free,
    instead of a separate XLA reduce over the [B, C, Lbuf] planes (one full
    memory pass saved per statistic per layer). Per-sample (not whole-batch)
    so the fused two-stage step can slice group statistics for free."""
    out, part = conv_plane_geo(xp, fold_kernel(kernel), mask, H, W, geo=geo)
    out = jnp.where(mask[None] > 0, out, 0).astype(xp.dtype)
    s = part.sum(1)                                         # [B, 2, C] f32
    return out, s[:, 0], s[:, 1]


def _pcs_fwd(xp, kernel, mask, H, W, geo):
    out, ssum, ssq = plane_conv_stats(xp, kernel, mask, H, W, geo)
    return (out, ssum, ssq), (xp, kernel, mask, out)


def _pcs_bwd(H, W, geo, res, cot):
    xp, kernel, mask, out = res
    g_out, g_s, g_sq = cot                       # g_s/g_sq are [B, C]
    # d(sum)/d(out) = mask ; d(sumsq)/d(out) = 2*out*mask — fold both into
    # the output cotangent, then reuse the pure-conv backward.
    g = (g_out.astype(jnp.float32)
         + mask[None] * (g_s[:, :, None]
                         + 2.0 * out.astype(jnp.float32)
                         * g_sq[:, :, None]))
    dxp, dk, _ = _plane_conv_bwd(H, W, geo, (xp, kernel, mask), g)
    return dxp, dk, None


plane_conv_stats.defvjp(_pcs_fwd, _pcs_bwd)
