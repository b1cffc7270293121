"""Pooling helpers for channels-last feature maps."""
from __future__ import annotations

import jax.numpy as jnp


def _bin_bounds(in_size: int, out_size: int):
    """torch-style adaptive pooling bin boundaries."""
    starts = [(i * in_size) // out_size for i in range(out_size)]
    ends = [-(-(i + 1) * in_size // out_size) for i in range(out_size)]
    return starts, ends


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: tuple[int, int],
                        accum_dtype=None) -> jnp.ndarray:
    """NHWC adaptive average pooling matching torch AdaptiveAvgPool2d bins.

    ``accum_dtype`` sets the mean's accumulation (and output) dtype without
    materializing an upcast copy of ``x`` — the convert rides inside the
    reduction fusion (a separate ``x.astype(f32)`` before a full-res pool
    measured as an 822 MB materialized copy on TPU, r5 trace)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    if H % oh == 0 and W % ow == 0:
        kh, kw = H // oh, W // ow
        if accum_dtype == jnp.float32 and x.dtype == jnp.bfloat16:
            # bf16 input, f32 accumulation WITHOUT a standalone convert or
            # a bare reduce: the backend runs an 822 MB convert at ~8x
            # below bandwidth, won't fuse it into a reduce, and
            # canonicalizes ones-vector dots back into that convert+reduce
            # (r5 decoder traces: 12 ms standalone / 11 ms re-fused into
            # the producing conv / 7.6 ms as a "reduce"). An unrolled
            # slice-add chain is a pure elementwise DAG — the per-slice
            # converts ride inside one loop fusion at bandwidth.
            # NOTE r5: a strided-slice variant (x[:, r::kh], no reshape)
            # measured WORSE (301.9 vs 268.7 ms decoder step) — the
            # strided H-slices of the conv layout each materialize, while
            # the one reshape copy (7.5 ms) at least amortizes over all
            # kh slice-adds. Kept as the measured-best form.
            xr = x.reshape(B, oh, kh, W, C)
            y = sum(xr[:, :, r].astype(jnp.float32) for r in range(kh))
            yr = y.reshape(B, oh, ow, kw, C)
            z = sum(yr[:, :, :, r] for r in range(kw))
            return z / float(kh * kw)
        return x.reshape(B, oh, kh, ow, kw, C).mean(
            axis=(2, 4), dtype=accum_dtype)
    hs, he = _bin_bounds(H, oh)
    ws, we = _bin_bounds(W, ow)
    rows = [jnp.stack([x[:, hs[i]:he[i], ws[j]:we[j], :].mean(
                          axis=(1, 2), dtype=accum_dtype)
                       for j in range(ow)], axis=1) for i in range(oh)]
    return jnp.stack(rows, axis=1)


def adaptive_max_pool2d(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    B, H, W, C = x.shape
    oh, ow = out_hw
    if H % oh == 0 and W % ow == 0:
        return x.reshape(B, oh, H // oh, ow, W // ow, C).max(axis=(2, 4))
    hs, he = _bin_bounds(H, oh)
    ws, we = _bin_bounds(W, ow)
    rows = [jnp.stack([x[:, hs[i]:he[i], ws[j]:we[j], :].max(axis=(1, 2))
                       for j in range(ow)], axis=1) for i in range(oh)]
    return jnp.stack(rows, axis=1)
