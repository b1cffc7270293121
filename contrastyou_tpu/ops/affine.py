"""On-device batched geometric + intensity augmentation with exact
transform replay — the TPU replacement for the reference's rising-based
GPU batch transforms (semi_seg/augment.py:286-311 ``RisingWrapper``,
epochers/epocher.py:226-238 BaseAffine/Mirror/GammaCorrection).

The reference synchronizes ``T(f(x))`` vs ``f(T(x))`` by re-seeding python
RNG around the transform. Here the transform is explicit data: sample a
``GeoParams`` batch from a PRNG key once, then apply it to the input image
(bilinear or nearest) and to the logits (the same params, by construction
identical geometry). This makes equivariance exact and jit-compatible.

Parameter ranges mirror the reference: scale U(0.8, 1.3), rotation
U(-45°, 45°), translation U(-0.1, 0.1) of the image size, mirror with
p=0.9 over a random axis, gamma U(0.5, 2).

All sampling is gather-based bilinear/nearest over normalized [-1, 1]
coordinates with zeros padding (matching grid_sample semantics the
reference's rising library uses underneath).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from ..perf import get as perf_knob


class GeoParams(NamedTuple):
    """Per-sample geometric transform parameters (all [B]-shaped)."""
    scale: jnp.ndarray
    angle: jnp.ndarray       # radians
    tx: jnp.ndarray          # translation, fraction of size in [-1,1] coords
    ty: jnp.ndarray
    flip_h: jnp.ndarray      # bool
    flip_w: jnp.ndarray      # bool


def sample_geo_params(key: jax.Array, batch: int, *,
                      scale_range: Tuple[float, float] = (0.8, 1.3),
                      degree_range: float = 45.0,
                      translate_range: float = 0.1,
                      mirror_p: float = 0.9) -> GeoParams:
    ks = jax.random.split(key, 6)
    scale = jax.random.uniform(ks[0], (batch,), minval=scale_range[0],
                               maxval=scale_range[1])
    angle = jax.random.uniform(ks[1], (batch,),
                               minval=-degree_range, maxval=degree_range)
    angle = angle * (math.pi / 180.0)
    tx = jax.random.uniform(ks[2], (batch,), minval=-translate_range,
                            maxval=translate_range) * 2.0
    ty = jax.random.uniform(ks[3], (batch,), minval=-translate_range,
                            maxval=translate_range) * 2.0
    do_mirror = jax.random.uniform(ks[4], (batch,)) < mirror_p
    axis = jax.random.bernoulli(ks[5], 0.5, (batch,))
    return GeoParams(scale=scale, angle=angle, tx=tx, ty=ty,
                     flip_h=do_mirror & axis, flip_w=do_mirror & ~axis)


def identity_geo_params(batch: int) -> GeoParams:
    z = jnp.zeros((batch,))
    f = jnp.zeros((batch,), bool)
    return GeoParams(scale=jnp.ones((batch,)), angle=z, tx=z, ty=z,
                     flip_h=f, flip_w=f)


def affine_matrices(params: GeoParams) -> jnp.ndarray:
    """[B, 2, 3] output->input sampling matrices in normalized coords:
    q = (1/s) R(-theta) (p - t)."""
    inv_s = 1.0 / params.scale
    c, s = jnp.cos(params.angle), jnp.sin(params.angle)
    a00 = inv_s * c
    a01 = inv_s * s
    a10 = -inv_s * s
    a11 = inv_s * c
    b0 = -(a00 * params.tx + a01 * params.ty)
    b1 = -(a10 * params.tx + a11 * params.ty)
    return jnp.stack([jnp.stack([a00, a01, b0], -1),
                      jnp.stack([a10, a11, b1], -1)], -2)


def _grid(H: int, W: int) -> jnp.ndarray:
    """[H, W, 2] normalized (x, y) target coordinates, pixel centers."""
    ys = (jnp.arange(H) + 0.5) / H * 2.0 - 1.0
    xs = (jnp.arange(W) + 0.5) / W * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def grid_sample(images: jnp.ndarray, coords: jnp.ndarray, *, order: int,
                padding: str = "zeros") -> jnp.ndarray:
    """Sample NHWC ``images`` at normalized (x, y) ``coords`` [B, H', W', 2];
    order 0 = nearest, 1 = bilinear; padding "zeros" (grid_sample default, the
    reference behavior) or "edge" (clamp — avoids black borders that pollute
    BN statistics, see BENCH_NOTES.md)."""
    assert padding in ("zeros", "edge"), padding
    B, H, W, C = images.shape
    x = (coords[..., 0] + 1.0) * 0.5 * W - 0.5
    y = (coords[..., 1] + 1.0) * 0.5 * H - 0.5

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat = images.reshape(B, H * W, C)
        idx = (yc * W + xc).reshape(B, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(*yi.shape, C)
        if padding == "zeros":
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            vals = vals * valid[..., None].astype(images.dtype)
        return vals

    if order == 0:
        return gather(jnp.round(y).astype(jnp.int32),
                      jnp.round(x).astype(jnp.int32))

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0).astype(images.dtype)[..., None]
    wy = (y - y0).astype(images.dtype)[..., None]
    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def _fast_warp_enabled() -> bool:
    """Fast-path gate for the nearest-neighbour warp: the TPU backend runs
    take_along_axis gathers at ~100M indices/s, so the two warp gathers of
    the semi step cost 5.4 ms (round-3 trace, the single largest source
    line). The decomposed warp below replaces them with MXU one-hot
    resamples + barrel-shifted shears (~0.2 ms). CONTRASTYOU_FAST_WARP=0
    forces the reference-faithful single-gather path; =1 forces the fast
    path (CPU included — how the test suite covers it); default: fast on
    TPU only."""
    import os
    raw = perf_knob("FAST_WARP")
    if raw == "0":
        return False
    if raw == "1":
        return True
    return jax.default_backend() == "tpu"


def _barrel_shift(x: jnp.ndarray, shift: jnp.ndarray, axis: int,
                  size: int) -> jnp.ndarray:
    """Per-row/column lane shift by a DATA-DEPENDENT integer amount without
    a gather: out[.., p, ..] = x[.., p + shift, ..] (wrap; callers mask the
    out-of-range wrap-around). ``shift`` broadcasts against x with the
    shifted ``axis`` removed (e.g. [B, H] for axis=2 on [B, H, W, C]).
    Implemented as a log2(size) conditional-roll cascade (a barrel
    shifter): every stage is one static jnp.roll + select, all
    bandwidth-bound VPU work."""
    r = jnp.mod(shift, size)                       # [B, rows] in [0, size)
    bshape = list(x.shape)
    bshape[axis] = 1
    for s in range(int(math.ceil(math.log2(max(size, 2))))):
        bit = ((r >> s) & 1).astype(bool)
        bit = bit.reshape(bit.shape + (1,) * (x.ndim - bit.ndim - 1))
        bit = jnp.expand_dims(bit, axis)
        x = jnp.where(bit, jnp.roll(x, -(1 << s), axis=axis), x)
    return x


def _onehot_pass_enabled(channels: int) -> bool:
    """Route a fast-warp 1-D pass through the one-hot-matmul form for
    wide-channel maps. The barrel-shift cascade costs ~log2(size) full-map
    roll+select stages (each ~3 map-reads of HBM traffic, and select_n
    backward doubles it): for the [B,224,224,32] bf16 feature maps of the
    dense hooks that is ~12 GB/warp — measured 108 ms of the 458 ms
    decoder-pretrain step (r5 trace). The one-hot form builds the per-row
    selection matrix P once (~[B,rows,out,in] bf16, 10x less traffic) and
    does the shift+candidate-select as ONE MXU contraction; its cost is
    C-independent, so it loses at C=1 images / C=4 logit maps (P dwarfs
    the 3-candidate tensor) and wins from C≈8 up.
    CONTRASTYOU_WARP_ONEHOT: "" auto (C >= 8), "1" always, "0" never."""
    raw = perf_knob("WARP_ONEHOT")
    if raw == "0":
        return False
    if raw == "1":
        return True
    return channels >= 8


def _pass_1d_onehot(x: jnp.ndarray, k: jnp.ndarray, r: jnp.ndarray,
                    n: jnp.ndarray, src: jnp.ndarray, axis: int,
                    size: int) -> jnp.ndarray:
    """One-hot-matmul evaluation of a fast-warp 1-D pass: the true input
    index ``mod(src + n - 1, size)`` (``src = r + k`` already folds the
    integer row shift) becomes a one-hot selection matrix contracted on the
    MXU — bitwise-identical to the barrel-shift + 3-candidate path (each
    output is exactly one input value; the validity mask zeroes the same
    wrap-arounds)."""
    true_idx = src + (n - 1)
    valid = (true_idx >= 0) & (true_idx < size)
    # fold validity into the (small) index tensor BEFORE the one-hot
    # compare: -1 matches no grid position, so the big [.., out, in] build
    # is ONE compare+convert fusion instead of compare AND compare AND
    # (a full-size pred intermediate measured 2.3 ms at pretrain shape)
    idx = jnp.where(valid, jnp.mod(true_idx, size), -1)
    grid = jnp.arange(size)
    sel = (idx[..., None] == grid).astype(x.dtype)
    if axis == 2:
        # sel [B, H, out, W]: out[b,h,o,c] = sum_w sel * x[b,h,w,c]
        return jnp.einsum("bhow,bhwc->bhoc", sel, x)
    # sel [B, out, W, H]: out[b,o,w,c] = sum_h sel * x[b,h,w,c]
    return jnp.einsum("bowh,bhwc->bowc", sel, x)


def _pass_1d(x: jnp.ndarray, slope: jnp.ndarray, rowc: jnp.ndarray,
             const: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Nearest 1-D resample along ``axis`` with the per-sample linear index
    map ``src = slope*p_axis + rowc*p_other + const`` and zeros padding —
    gather-free:

    split ``rowc*p_other + const = k + f`` (integer + fractional): the
    integer part is a per-row barrel shift of the INPUT; then
    ``round(slope*p + f) = round(slope*p) + n`` with ``n in {-1,0,1}``
    decided by the fractional threshold — three candidate one-hot MXU
    resamples (shared across rows) and an elementwise 3-way select."""
    B, H, W, C = x.shape
    size = W if axis == 2 else H
    osize = size
    p = jnp.arange(osize, dtype=jnp.float32)
    other = jnp.arange(H if axis == 2 else W, dtype=jnp.float32)
    cr = rowc[:, None] * other[None, :] + const[:, None]     # [B, other]
    k = jnp.round(cr).astype(jnp.int32)
    f = cr - k                                               # [-0.5, 0.5]
    sp = slope[:, None] * p[None, :]                         # [B, out]
    r = jnp.round(sp).astype(jnp.int32)
    t = sp - r                                               # [-0.5, 0.5]
    if axis == 2:
        d = t[:, None, :] + f[:, :, None]                    # [B, H, out]
        src = (r[:, None, :] + k[:, :, None])                # [B, H, out]
    else:
        d = t[:, :, None] + f[:, None, :]                    # [B, out, W]
        src = (r[:, :, None] + k[:, None, :])                # [B, out, W]
    # candidate id with jnp.round (half-to-even) semantics at d == +-0.5:
    # round(m + 0.5) = m when m even, m+1 when m odd (and mirrored at -0.5)
    odd = (src % 2) == 1
    n = jnp.where(
        (d > 0.5) | ((d == 0.5) & odd), 2,
        jnp.where((d < -0.5) | ((d == -0.5) & odd), 0, 1))   # candidate id
    if _onehot_pass_enabled(x.shape[-1]):
        return _pass_1d_onehot(x, k, r, n, src, axis, size)
    xs = _barrel_shift(x, k, axis=axis, size=size)
    # three candidate resamples in[.., r + n, ..] as ONE stacked one-hot
    # wrap the candidate rows mod size: the barrel shift is cyclic, so the
    # true input index (k + r + n) mod size is what xs is addressed by;
    # out-of-range TRUE indices are zeroed by the validity mask below
    sel = (jnp.mod(r[:, :, None, None]
                   + jnp.arange(-1, 2)[None, None, :, None], size)
           == jnp.arange(size)[None, None, None, :])         # [B,out,3,in]
    sel = sel.astype(x.dtype)
    if axis == 2:
        cand = jnp.einsum("bhwc,bonw->bhonc", xs, sel)       # [B,H,out,3,C]
    else:
        cand = jnp.einsum("bhwc,bonh->bonwc", xs, sel)       # [B,out,3,W,C]
        cand = jnp.moveaxis(cand, 2, -2)                     # [B,out,W,3,C]
    oh = (n[..., None] == jnp.arange(3)[None, None, None, :])
    out = (cand * oh[..., None].astype(x.dtype)).sum(-2)
    valid = ((src + (n - 1) >= 0) & (src + (n - 1) < size))
    return out * valid[..., None].astype(x.dtype)


def _apply_geometric_fast(images: jnp.ndarray, params: GeoParams,
                          ) -> jnp.ndarray:
    """Nearest-neighbour affine warp WITHOUT gathers: the classic two-pass
    decomposition (Catmull & Smith '80) — a horizontal 1-D resample whose
    per-row offsets account for the rotation, then a vertical 1-D resample
    — with each 1-D pass built from a per-row integer barrel shift + three
    shared one-hot MXU resamples + a fractional select (:func:`_pass_1d`),
    and the mirror as output reverses.

    Same contract as the gather path (same GeoParams -> identical warp for
    images and logits, zeros padding): the vertical index rounds exactly
    like the gather path; the horizontal index can differ by at most 1 px
    where the rounded row disagrees with the exact row (|dx| <=
    0.5*|tan(angle)|) — an equivalent augmentation, NOT bit-identical
    (tests assert the contract and high exact-pixel agreement at reference
    parameter ranges). Requires square inputs. The horizontal-pass slope
    has a 1/L11 factor, so |angle| is safe up to ~70 deg (reference range
    45); beyond that the pass-1 slope is clamped (still a bounded, valid
    warp — set CONTRASTYOU_FAST_WARP=0 for reference-faithful semantics at
    extreme angles)."""
    B, H, W, C = images.shape
    assert H == W, (H, W)
    mats = affine_matrices(params)                 # [B, 2, 3], no flips
    L = mats[:, :, :2]
    # exact pixel-coord affine map q_pix = L p_pix + o (square H == W)
    pn0 = 1.0 / W - 1.0                            # normalized coord of pixel 0
    qn0 = (L @ jnp.array([pn0, pn0])[:, None])[:, :, 0]      # [B, 2]
    o = (qn0 + mats[:, :, 2] + 1.0) * (0.5 * W) - 0.5        # [B, 2]
    a, b = L[:, 0, 0], L[:, 0, 1]
    c, dd = L[:, 1, 0], L[:, 1, 1]
    e, fo = o[:, 0], o[:, 1]
    # guard the 1/d factor (degenerate near +-90 deg; see docstring)
    dsafe = jnp.where(jnp.abs(dd) < 0.3, jnp.where(dd < 0, -0.3, 0.3), dd)
    # pass 1 (horizontal): m[i, jo] = in[i, round(s1*jo + (b/d)*i + cc)]
    s1 = a - b * c / dsafe
    m = _pass_1d(images, s1, b / dsafe, e - b * fo / dsafe, axis=2)
    # pass 2 (vertical): out[io, jo] = m[round(d*io + c*jo + f), jo]
    out = _pass_1d(m, dd, c, fo, axis=1)
    return apply_flips(out, params)


def apply_flips(images: jnp.ndarray, params: GeoParams) -> jnp.ndarray:
    out = jnp.where(params.flip_h[:, None, None, None],
                    images[:, ::-1, :, :], images)
    return jnp.where(params.flip_w[:, None, None, None],
                     out[:, :, ::-1, :], out)


def apply_geometric(images: jnp.ndarray, params: GeoParams, *, order: int = 1,
                    padding: str = "zeros") -> jnp.ndarray:
    """Affine (rotate/scale/translate) then mirror, NHWC.

    The mirror is folded into the sampling matrix (mirror-after-warp ==
    warp sampled at mirrored output coords, and normalized pixel-center
    coords are exact sign flips), so the whole geometric transform is ONE
    gather instead of gather + two masked-select passes (+ their
    backward) — identical outputs for identical ``GeoParams``.

    order=0 + zeros padding + square input routes through the gather-free
    decomposed warp on TPU (see :func:`_fast_warp_enabled`)."""
    B, H, W, _ = images.shape
    if (order == 0 and padding == "zeros" and H == W
            and _fast_warp_enabled()):
        return _apply_geometric_fast(images, params)
    mats = affine_matrices(params)
    sign_x = jnp.where(params.flip_w, -1.0, 1.0)
    sign_y = jnp.where(params.flip_h, -1.0, 1.0)
    col_signs = jnp.stack(
        [sign_x, sign_y, jnp.ones_like(sign_x)], axis=-1)  # B, 3
    mats = mats * col_signs[:, None, :]
    grid = _grid(H, W)                                     # H, W, 2
    hom = jnp.concatenate([grid, jnp.ones((H, W, 1))], -1)  # H, W, 3
    coords = jnp.einsum("bij,hwj->bhwi", mats, hom)         # B, H, W, 2
    return grid_sample(images, coords, order=order, padding=padding)


def apply_gamma(images: jnp.ndarray, key: jax.Array, *,
                gamma_range: Tuple[float, float] = (0.5, 2.0)) -> jnp.ndarray:
    """Per-sample gamma correction on [0, 1] images (ref GammaCorrection)."""
    B = images.shape[0]
    gamma = jax.random.uniform(key, (B, 1, 1, 1), minval=gamma_range[0],
                               maxval=gamma_range[1])
    return jnp.clip(images, 0.0, 1.0) ** gamma


def transform_image(images: jnp.ndarray, params: GeoParams, key: jax.Array, *,
                    order: int = 0, gamma: bool = True) -> jnp.ndarray:
    """mode="image" of the reference RisingWrapper: intensity then geometry.
    Default order=0 (nearest) mirrors the reference BaseAffine interpolation."""
    out = apply_gamma(images, key) if gamma else images
    return apply_geometric(out, params, order=order)


def transform_logits(logits: jnp.ndarray, params: GeoParams, *, order: int = 0
                     ) -> jnp.ndarray:
    """mode="feature": geometry only — aligns f(x) with f(T(x))."""
    return apply_geometric(logits, params, order=order)
