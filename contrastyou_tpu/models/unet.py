"""Named-layer U-Net, TPU-native (flax.linen, NHWC, bf16 compute).

Capability match for contrastyou/arch/unet.py:49-261:
- identical layer registry: ``encoder_names``/``decoder_names``/``arch_elements``
  and ``layer_dimension`` width table (widths = table/16 * max_channel);
- partial forward ``until=<name>`` for pretraining truncation (unet.py:105-177);
- feature taps: instead of PyTorch forward hooks (arch/utils.py:33-159), the
  forward takes a static ``taps`` tuple of layer names and returns their
  activations — no mutable hook state, fully jit-compatible;
- ``switch_grad`` / ``switch_bn_track`` context managers become pure data:
  `trainable_mask()` produces an optax-compatible bool PyTree over the named
  top-level param groups (see masks.py), and batch-stat updating is decided by
  the caller keeping or discarding the returned ``batch_stats`` collection.

TPU design notes: convolutions are NHWC (XLA's native TPU conv layout),
compute dtype defaults to bf16 with f32 params and f32 BatchNorm statistics;
2x nearest upsampling is a reshape-broadcast (no gather).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from ..perf import get as perf_knob

# (MXU-reduction BatchNorm, models/norm.py, was measured slower end-to-end
# than the convert_reduce fusions it replaced — BENCH_NOTES round-2b — and
# UpConv now uses the shared functional BN for per-group stats support)

__all__ = ["UNet", "ConvBlock", "UpConv"]


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest 2x upsample via broadcast (MXU/VPU friendly, no gather)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def conv3x3_on_upsampled(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3_SAME(upsample2x_nearest(x), kernel)`` as ONE transposed-style
    conv — the [B,2H,2W,C] nearest-upsampled intermediate is never built.

    Derivation: nearest-2x == zero-stuffing (lhs_dilation=2) correlated with
    ones(2,2), so conv3x3 on it == conv over the zero-stuffed input with the
    4x4 kernel ``w4 = w (*) ones(2,2)`` and padding (2,2). Identical math to
    upsample-then-conv (profiling showed the reshape in upsample2x_nearest
    costs ~150 MB/step of layout copies on the TPU backend)."""
    def sh(dh, dw):
        return jnp.pad(kernel, ((dh, 1 - dh), (dw, 1 - dw), (0, 0), (0, 0)))

    w4 = sh(0, 0) + sh(1, 0) + sh(0, 1) + sh(1, 1)           # [4,4,Cin,Cout]
    return jax.lax.conv_general_dilated(
        x, w4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _SplitInputConv(nn.Module):
    """3x3 conv over the channel-concat of two inputs WITHOUT materializing
    the concat: conv(concat([a, b]), W) == conv(a, W[:, :, :Ca]) +
    conv(b, W[:, :, Ca:]). One kernel param, identical tree/init to
    ``nn.Conv(features, (3,3), use_bias=False)`` over the concat — but XLA
    never builds the [B,H,W,Ca+Cb] tensor (profiling showed the decoder skip
    concats cost ~11 ms/step in layout copies on the TPU backend)."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, a, b):
        cin = a.shape[-1] + b.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        ya = jax.lax.conv_general_dilated(
            a.astype(self.dtype), k[:, :, :a.shape[-1]], (1, 1), "SAME",
            dimension_numbers=dn)
        yb = jax.lax.conv_general_dilated(
            b.astype(self.dtype), k[:, :, a.shape[-1]:], (1, 1), "SAME",
            dimension_numbers=dn)
        return ya + yb


def use_pallas_stage(features: int, dtype=jnp.bfloat16,
                     spatial: Tuple[int, int] = (0, 0),
                     cmax: int | None = None) -> bool:
    """Route eligible ConvBlocks through the Pallas plane kernels
    (ops/pallas/convblock.py). Round 3: the per-geometry (MB, PAD) selection
    makes every U-Net level representable; the wide-spatial small-C stages
    (features <= 64, the 224^2/112^2 levels) are on by default on TPU, the
    deep C >= 128 levels additionally behind CONTRASTYOU_PALLAS_DEEP=1
    (pending the on-chip A/B — small planes carry ~25% border-lane FLOP
    waste at 14^2 while XLA's lane utilization is already full at C >= 128).
    CONTRASTYOU_PALLAS_CONV ∈ {0, 1} force-disables/enables (=1 on CPU runs
    the kernels in interpret mode — that's how the default test suite covers
    them). f32 planes at 224^2 overflow the ~16MB VMEM budget, so non-bf16
    dtypes are gated to small spatial sizes."""
    import os
    H, W = spatial
    from ..ops.pallas.convblock import pick_geometry
    try:
        geo = pick_geometry(H, W, max(cmax or features, features),
                            jnp.dtype(dtype).itemsize)
    except ValueError:
        return False
    fits = dtype == jnp.bfloat16 or geo.P <= 20000
    halo_ok = geo.rs + 1 <= geo.pad
    deep = perf_knob("PALLAS_DEEP")
    # "1" routes every deep level; a comma list of feature widths routes
    # only those levels (e.g. "128" = the 56^2 Conv3/Up_conv4 pair) — the
    # per-level on-chip A/B knob (BENCH_NOTES round 3)
    deep_ok = (features <= 64 or deep == "1"
               or str(features) in deep.split(","))
    eligible = fits and halo_ok and deep_ok
    raw = perf_knob("PALLAS_CONV")
    if raw == "0":
        return False
    if raw == "1":
        return eligible
    import jax
    return jax.default_backend() == "tpu" and eligible


class _Kernel(nn.Module):
    """Bare conv-kernel param holder — tree-identical to ``nn.Conv`` with
    ``use_bias=False`` (scope ``name`` -> param "kernel")."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _BNState(nn.Module):
    """Bare BatchNorm state holder — tree-identical to ``nn.BatchNorm``
    (params scale/bias, batch_stats mean/var)."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


def _running_affine(scale, bias, ra_mean, ra_var, eps: float):
    """Inference-mode BN folded to a per-channel f32 affine (a, b) built
    from the RUNNING statistics — feeds the plane/parity kernel stages'
    ``eval_affine`` (exact nn.BatchNorm ``use_running_average`` math)."""
    a = scale * jax.lax.rsqrt(ra_var.value + eps)
    return a, bias - a * ra_mean.value


def _group_slices(B: int, groups: Tuple[int, ...]):
    offs, out = 0, []
    for g in groups:
        out.append((offs, offs + g))
        offs += g
    assert offs == B, (groups, B)
    return out


def _bn_relu_groups(module, p, scale, bias, ra_mean, ra_var, *,
                    train: bool, momentum: float, eps: float,
                    bn_groups=None, bn_update=None):
    """BatchNorm + ReLU with optional PER-GROUP batch statistics.

    ``bn_groups``: static tuple of contiguous batch-subset sizes; each
    subset is normalized with ITS OWN batch statistics, exactly as if the
    subsets had been run through the layer as separate forwards — this is
    what makes the fused two-stage semi step (one batch-15 conv pass)
    bit-equal in semantics to the reference's two sequential passes
    (epocher.py:339-358 _forward_pass). Running stats receive one EMA
    update PER GROUP, in group order, gated by ``bn_update`` (the
    disable_bn knob maps to bn_update=(True, False))."""
    def upd(mean, var):
        if module.is_initializing():
            return
        m = momentum      # torch convention: new = (1-m)*old + m*batch
        ra_mean.value = ((1.0 - m) * ra_mean.value
                         + m * jax.lax.stop_gradient(mean))
        ra_var.value = ((1.0 - m) * ra_var.value
                        + m * jax.lax.stop_gradient(var))

    if not train:
        a = scale * jax.lax.rsqrt(ra_var.value + eps)
        b = bias - a * ra_mean.value
        return nn.relu(p * a.astype(p.dtype) + b.astype(p.dtype))

    pf = p.astype(jnp.float32)
    if bn_groups is None:
        mean = pf.mean((0, 1, 2))
        var = jnp.maximum((pf * pf).mean((0, 1, 2)) - mean * mean, 0.0)
        upd(mean, var)
        a = scale * jax.lax.rsqrt(var + eps)
        b = bias - a * mean
        return nn.relu(p * a.astype(p.dtype) + b.astype(p.dtype))

    bn_update = bn_update or (True,) * len(bn_groups)
    a_rows, b_rows = [], []
    for ((lo, hi), do_upd), g in zip(
            zip(_group_slices(p.shape[0], tuple(bn_groups)), bn_update),
            bn_groups):
        sub = pf[lo:hi]
        mean = sub.mean((0, 1, 2))
        var = jnp.maximum((sub * sub).mean((0, 1, 2)) - mean * mean, 0.0)
        if do_upd:
            upd(mean, var)
        a = scale * jax.lax.rsqrt(var + eps)
        b = bias - a * mean
        a_rows.append(jnp.broadcast_to(a, (g, a.shape[0])))
        b_rows.append(jnp.broadcast_to(b, (g, b.shape[0])))
    # per-sample [B, C] affine (tiny) applied as ONE fused elementwise —
    # concatenating normalized activation slices instead cost ~11 ms/step
    # of extra memory passes (round-3 probe)
    a_ps = jnp.concatenate(a_rows, 0).astype(p.dtype)[:, None, None, :]
    b_ps = jnp.concatenate(b_rows, 0).astype(p.dtype)[:, None, None, :]
    return nn.relu(p * a_ps + b_ps)


class ConvBlock(nn.Module):
    """Two 3x3 conv + norm + ReLU (ref: unet.py:16-31 ``_ConvBlock``).

    When ``skip`` is given, the block behaves exactly as if called on
    ``concatenate([skip, x], -1)`` (the U-Net decoder pattern) but the first
    conv is computed as two convs on slices of one shared kernel, so the
    concat is never materialized. The param tree is identical either way.

    In batchnorm mode the block is written in explicit functional form (bare
    param/state holders + lax ops) so the same params drive two compute
    paths: the XLA path (flax-BatchNorm-equivalent numerics) and, for the
    eligible wide-spatial stages on TPU, the fused Pallas plane-kernel stage
    (ops/pallas/convblock.py) — ~2.2x faster measured on-chip.

    ``bn_groups``/``bn_update``: per-group batch statistics for the fused
    two-stage step (see :func:`_bn_relu_groups`)."""
    features: int
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.bfloat16
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, skip=None, *, train: bool = True,
                 bn_groups=None, bn_update=None,
                 plane_info: Optional[Tuple[int, int]] = None,
                 skip_is_plane: bool = False, plane_out: bool = False,
                 parity_info=None):
        plane_io = (plane_info is not None or skip_is_plane or plane_out)
        if self.norm != "batchnorm":
            assert not plane_io and parity_info is None, \
                "plane IO requires the batchnorm pallas path"
            return self._groupnorm_path(x, skip, train)
        if parity_info is not None:
            # parity-domain stage: x/skip are [B, 4, C, Lbuf] parity planes
            # at quarter resolution (ops/pallas/convblock.py section doc)
            assert not plane_io, "parity stage excludes dense plane IO"
            cin_x, cin_s = x.shape[2], skip.shape[2] if skip is not None else 0
        else:
            cin_x = x.shape[1] if plane_info is not None else x.shape[-1]
            cin_s = ((skip.shape[1] if skip_is_plane else skip.shape[-1])
                     if skip is not None else 0)
        cin = cin_x + cin_s
        k0 = _Kernel((3, 3, cin, self.features), name="conv0")()
        s0, b0, m0, v0 = _BNState(self.features, name="bn0")()
        k1 = _Kernel((3, 3, self.features, self.features), name="conv1")()
        s1, b1, m1, v1 = _BNState(self.features, name="bn1")()

        if parity_info is not None:
            from ..ops.pallas.convblock import parity_convblock_stage
            Hq, Wq, geo = parity_info
            out, (mv0, mv1) = parity_convblock_stage(
                x, skip, k0.astype(self.dtype), k1.astype(self.dtype),
                (s0, b0), (s1, b1), eps=self.eps, dtype=self.dtype,
                Hq=Hq, Wq=Wq, geo=geo,
                bn_groups=tuple(bn_groups) if bn_groups else None,
                eval_affine=None if train else (
                    _running_affine(s0, b0, m0, v0, self.eps),
                    _running_affine(s1, b1, m1, v1, self.eps)))
            if train:
                upd = bn_update or (True,) * len(mv0)
                for (mu, va), do_upd in zip(mv0, upd):
                    if do_upd:
                        self._update_running(m0, v0, mu, va)
                for (mu, va), do_upd in zip(mv1, upd):
                    if do_upd:
                        self._update_running(m1, v1, mu, va)
            return out

        spatial = (plane_info if plane_info is not None
                   else (x.shape[1], x.shape[2]))
        if ((plane_io or not self.is_initializing())
                and use_pallas_stage(self.features, self.dtype, spatial,
                                     cmax=cin)):
            from ..ops.pallas.convblock import convblock_stage
            out, (g_mv0, g_mv1) = convblock_stage(
                x, skip, k0.astype(self.dtype), k1.astype(self.dtype),
                (s0, b0), (s1, b1), eps=self.eps, dtype=self.dtype,
                bn_groups=tuple(bn_groups) if bn_groups else None,
                plane_info=plane_info, skip_is_plane=skip_is_plane,
                plane_out=plane_out,
                eval_affine=None if train else (
                    _running_affine(s0, b0, m0, v0, self.eps),
                    _running_affine(s1, b1, m1, v1, self.eps)))
            if train:
                upd = bn_update or (True,) * len(g_mv0)
                for (mu, va), do_upd in zip(g_mv0, upd):
                    if do_upd:
                        self._update_running(m0, v0, mu, va)
                for (mu, va), do_upd in zip(g_mv1, upd):
                    if do_upd:
                        self._update_running(m1, v1, mu, va)
            return out
        assert not plane_io, (
            "plane IO flags passed to a ConvBlock that did not route to the "
            "pallas stage — the UNet chaining plan is out of sync with "
            "use_pallas_stage")

        # XLA path (flax-equivalent numerics)
        def conv(h, k, hskip=None):
            dn = ("NHWC", "HWIO", "NHWC")
            k = k.astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                h.astype(self.dtype), k[:, :, hskip.shape[-1]:]
                if hskip is not None else k, (1, 1), "SAME",
                dimension_numbers=dn)
            if hskip is not None:
                y = y + jax.lax.conv_general_dilated(
                    hskip.astype(self.dtype), k[:, :, :hskip.shape[-1]],
                    (1, 1), "SAME", dimension_numbers=dn)
            return y

        p0 = conv(x, k0, skip)
        h0 = self._bn_relu(p0, s0, b0, m0, v0, train, bn_groups, bn_update)
        p1 = conv(h0, k1)
        return self._bn_relu(p1, s1, b1, m1, v1, train, bn_groups, bn_update)

    def _bn_relu(self, p, scale, bias, ra_mean, ra_var, train,
                 bn_groups=None, bn_update=None):
        return _bn_relu_groups(self, p, scale, bias, ra_mean, ra_var,
                               train=train, momentum=self.momentum,
                               eps=self.eps, bn_groups=bn_groups,
                               bn_update=bn_update)

    def _update_running(self, ra_mean, ra_var, mean, var):
        if self.is_initializing():
            return
        m = self.momentum      # torch convention
        ra_mean.value = ((1.0 - m) * ra_mean.value
                         + m * jax.lax.stop_gradient(mean))
        ra_var.value = ((1.0 - m) * ra_var.value
                        + m * jax.lax.stop_gradient(var))

    def _groupnorm_path(self, x, skip, train):
        if skip is not None:
            x = _SplitInputConv(self.features, dtype=self.dtype,
                                name="conv0")(skip, x)
        else:
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv0")(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype,
                         name="gn0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype,
                         name="gn1")(x)
        return nn.relu(x)


class _Deconv1x1(nn.Module):
    """1x1 conv head, param-tree identical to
    ``nn.Conv(features, (1, 1), padding="VALID")`` (params kernel/bias, same
    init), with an extra PLANE input path: when the producing decoder stage
    stays in the Pallas plane layout, the class projection runs as one
    [B, C, L] x [C, K] einsum IN plane layout and the final
    channel<->spatial transpose moves only ``K`` (=num_classes) channels
    instead of the stage width (from_planes at 4 vs 32 channels)."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, plane_info=None, parity_info=None):
        if parity_info is not None:
            cin = x.shape[2]
        else:
            cin = x.shape[1] if plane_info is not None else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if parity_info is not None:
            from ..ops.pallas.convblock import parity_head_to_nhwc
            Hq, Wq, geo = parity_info
            return parity_head_to_nhwc(x, kernel[0, 0], bias, Hq, Wq, geo)
        if plane_info is None:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(y.dtype)
        from ..ops.pallas.convblock import conv1x1_from_planes
        H, W, geo = plane_info
        return conv1x1_from_planes(x, kernel[0, 0], bias, H, W, geo)


class _UpsampledConv(nn.Module):
    """kernel param "kernel" (same tree as nn.Conv) applied through
    :func:`conv3x3_on_upsampled`."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        return conv3x3_on_upsampled(x.astype(self.dtype),
                                    kernel.astype(self.dtype))


class UpConv(nn.Module):
    """2x nearest upsample + 3x3 conv + norm + ReLU (ref: unet.py:34-47).

    The BN is the same explicit functional form as ConvBlock's (tree-
    identical to ``nn.BatchNorm(name="bn")``) so it supports the per-group
    batch statistics of the fused two-stage step.

    Plane path (round 3): when ``plane_out_geo`` is given, the
    upsample+conv runs as four quarter-resolution parity plane convs
    (ops/pallas/convblock.py ``upconv_plane``) and the BN+ReLU output is
    returned as guarded planes at (2H, 2W) in that geometry — the UNet
    chaining plan uses this to keep the whole decoder tail in plane layout.
    ``plane_info=(H, W, geo_in)`` additionally declares the input is
    already planes."""
    features: int
    momentum: float = 0.1
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.bfloat16
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, train: bool = True, bn_groups=None,
                 bn_update=None, plane_info=None, plane_out_geo=None,
                 parity_out=None):
        if parity_out is not None:
            assert self.norm == "batchnorm" and plane_out_geo is None
            return self._parity_path(x, plane_info, parity_out,
                                     bn_groups, bn_update, train)
        if plane_out_geo is not None:
            assert self.norm == "batchnorm", \
                "plane UpConv requires batchnorm"
            return self._plane_path(x, plane_info, plane_out_geo,
                                    bn_groups, bn_update, train)
        assert plane_info is None, "plane input requires plane_out_geo"
        # one fused upsample+conv; param tree identical to
        # nn.Conv(features, (3,3), use_bias=False, name="conv")
        x = _UpsampledConv(self.features, dtype=self.dtype, name="conv")(x)
        if self.norm == "batchnorm":
            s, b, m, v = _BNState(self.features, name="bn")()
            return _bn_relu_groups(self, x, s, b, m, v, train=train,
                                   momentum=self.momentum, eps=self.eps,
                                   bn_groups=bn_groups, bn_update=bn_update)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype,
                         name="gn")(x)
        return nn.relu(x)

    def _plane_path(self, x, plane_info, geo_out, bn_groups, bn_update,
                    train=True):
        from ..ops.pallas.convblock import (_broadcast_affine, _group_mv,
                                            apply_bn_relu_planes,
                                            border_mask, pick_geometry,
                                            to_planes, upconv_plane)
        if plane_info is None:
            B, H, W, cin = x.shape
            geo_in = pick_geometry(H, W, max(cin, self.features),
                                   jnp.dtype(self.dtype).itemsize)
            xp = to_planes(x, self.dtype, geo_in)
        else:
            H, W, geo_in = plane_info
            xp = x
            B, cin, _ = x.shape
        # param trees identical to the XLA path (conv/kernel, bn/*)
        kernel = _Kernel((3, 3, cin, self.features), name="conv")()
        s, b, m, v = _BNState(self.features, name="bn")()
        p, ssum, ssq = upconv_plane(xp, kernel.astype(self.dtype), H, W,
                                    geo_in, geo_out)
        if not train:
            a_ps, b_ps = _running_affine(s, b, m, v, self.eps)
            return apply_bn_relu_planes(p, a_ps, b_ps,
                                        border_mask(2 * H, 2 * W, geo_out))
        groups = tuple(bn_groups) if bn_groups else (B,)
        mvs = _group_mv(ssum, ssq, groups, 4 * H * W)
        upd = bn_update or (True,) * len(mvs)
        for (mu, va), do_upd in zip(mvs, upd):
            if do_upd and not self.is_initializing():
                mm = self.momentum
                m.value = (1.0 - mm) * m.value + mm * jax.lax.stop_gradient(mu)
                v.value = (1.0 - mm) * v.value + mm * jax.lax.stop_gradient(va)
        a_ps, b_ps = _broadcast_affine(mvs, s, b, groups, self.eps)
        if len(groups) == 1:
            a_ps, b_ps = a_ps[0], b_ps[0]       # [C] whole-batch affine
        return apply_bn_relu_planes(p, a_ps, b_ps,
                                    border_mask(2 * H, 2 * W, geo_out))

    def _parity_path(self, x, plane_info, parity_out, bn_groups, bn_update,
                     train=True):
        """upsample2x+conv3x3+BN+ReLU whose (2H, 2W) output STAYS as the
        four parity planes [B, 4, Cout, Lbuf] at the input's quarter
        geometry (ops/pallas/convblock.py ``upconv_plane_parity``) — the
        parity-domain chain's Up2 (ref: arch/unet.py:34-47 up_conv)."""
        from ..ops.pallas.convblock import (_apply_bn_relu_parity,
                                            _broadcast_affine, _group_mv,
                                            border_mask, to_planes,
                                            upconv_plane_parity)
        Hq, Wq, geo = parity_out
        if plane_info is None:
            B, H, W, cin = x.shape
            assert (H, W) == (Hq, Wq), ((H, W), (Hq, Wq))
            xp = to_planes(x, self.dtype, geo)
        else:
            H, W, geo_in = plane_info
            assert (H, W) == (Hq, Wq) and geo_in == geo
            xp = x
            B, cin, _ = x.shape
        kernel = _Kernel((3, 3, cin, self.features), name="conv")()
        s, b, m, v = _BNState(self.features, name="bn")()
        p, ssum, ssq = upconv_plane_parity(xp, kernel.astype(self.dtype),
                                           Hq, Wq, geo)
        if not train:
            a_ps, b_ps = _running_affine(s, b, m, v, self.eps)
            return _apply_bn_relu_parity(p, a_ps, b_ps,
                                         border_mask(Hq, Wq, geo))
        groups = tuple(bn_groups) if bn_groups else (B,)
        mvs = _group_mv(ssum, ssq, groups, 4 * Hq * Wq)
        upd = bn_update or (True,) * len(mvs)
        for (mu, va), do_upd in zip(mvs, upd):
            if do_upd and not self.is_initializing():
                mm = self.momentum
                m.value = (1.0 - mm) * m.value + mm * jax.lax.stop_gradient(mu)
                v.value = (1.0 - mm) * v.value + mm * jax.lax.stop_gradient(va)
        a_ps, b_ps = _broadcast_affine(mvs, s, b, groups, self.eps)
        if len(groups) == 1:
            a_ps, b_ps = a_ps[0], b_ps[0]       # [C] whole-batch affine
        return _apply_bn_relu_parity(p, a_ps, b_ps,
                                     border_mask(Hq, Wq, geo))


class UNet(nn.Module):
    """5-level U-Net with a named-layer registry and partial forward."""

    layer_dimension = {"Conv1": 1, "Conv2": 2, "Conv3": 4, "Conv4": 8, "Conv5": 16,
                       "Up_conv5": 8, "Up_conv4": 4, "Up_conv3": 2, "Up_conv2": 1,
                       "Deconv_1x1": None}
    encoder_names = ("Conv1", "Conv2", "Conv3", "Conv4", "Conv5")
    decoder_names = ("Up5", "Up_conv5", "Up4", "Up_conv4", "Up3", "Up_conv3",
                     "Up2", "Up_conv2", "Deconv_1x1")
    arch_elements = encoder_names + decoder_names

    input_dim: int = 1
    num_classes: int = 4
    max_channel: int = 256
    momentum: float = 0.1
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.bfloat16

    def get_channel_dim(self, name: str) -> int:
        if name == "Deconv_1x1":
            return self.num_classes
        if name in self.layer_dimension:
            return int(self.layer_dimension[name] / 16 * self.max_channel)
        raise KeyError(name)

    def setup(self):
        assert self.max_channel % 16 == 0 and self.max_channel >= 128, self.max_channel
        kw = dict(momentum=self.momentum, norm=self.norm, dtype=self.dtype)
        cd = self.get_channel_dim
        self.Conv1 = ConvBlock(cd("Conv1"), **kw)
        self.Conv2 = ConvBlock(cd("Conv2"), **kw)
        self.Conv3 = ConvBlock(cd("Conv3"), **kw)
        self.Conv4 = ConvBlock(cd("Conv4"), **kw)
        self.Conv5 = ConvBlock(cd("Conv5"), **kw)
        self.Up5 = UpConv(cd("Up_conv5"), **kw)
        self.Up_conv5 = ConvBlock(cd("Up_conv5"), **kw)
        self.Up4 = UpConv(cd("Up_conv4"), **kw)
        self.Up_conv4 = ConvBlock(cd("Up_conv4"), **kw)
        self.Up3 = UpConv(cd("Up_conv3"), **kw)
        self.Up_conv3 = ConvBlock(cd("Up_conv3"), **kw)
        self.Up2 = UpConv(cd("Up_conv2"), **kw)
        self.Up_conv2 = ConvBlock(cd("Up_conv2"), **kw)
        self.Deconv_1x1 = _Deconv1x1(self.num_classes, dtype=self.dtype,
                                     name="Deconv_1x1")

    #: build_train_step may fuse the two-stage semi forward into one pass
    #: with per-group BN statistics (see _bn_relu_groups)
    supports_bn_groups = True

    #: __call__ accepts the fwd_only hint (teacher passes: train-mode BN but
    #: never differentiated -> parity chain defaults on)
    supports_fwd_only = True

    def __call__(self, x: jnp.ndarray, *, until: Optional[str] = None,
                 taps: Sequence[str] = (), train: bool = True,
                 bn_groups: Optional[Tuple[int, ...]] = None,
                 bn_update: Optional[Tuple[bool, ...]] = None,
                 fwd_only: bool = False
                 ) -> Tuple[jnp.ndarray, dict]:
        """Forward over NHWC input. ``until``/``taps`` are static layer names.

        Returns ``(out, tap_dict)`` where ``out`` is the activation at ``until``
        (or logits) cast to f32, and ``tap_dict`` maps each requested tap name to
        its f32 activation. (ref: unet.py:105-177 partial forward semantics.)

        ``bn_groups``/``bn_update`` (static): contiguous batch-subset sizes
        whose BN statistics are computed independently — one fused conv pass
        with the exact semantics of per-subset forwards (the reference's
        two-stage, epocher.py:339-358).
        """
        taps = tuple(taps)
        for t in taps:
            if t not in self.layer_dimension:
                raise KeyError(f"tap '{t}' not in {tuple(self.layer_dimension)}")
        if until is not None and until not in self.layer_dimension:
            raise KeyError(f"`until` must be one of {tuple(self.layer_dimension)}, got {until}")

        collected: dict = {}

        def emit(name, value):
            if name in taps:
                collected[name] = value.astype(jnp.float32)
            return until == name

        kw = dict(train=train,
                  bn_groups=tuple(bn_groups) if bn_groups else None,
                  bn_update=tuple(bn_update) if bn_update else None)
        x = x.astype(self.dtype)

        # ---- static plane-chaining plan (round 3) ----------------------
        # The wide shallow levels route through the Pallas plane stage; when
        # producer AND consumer are both plane stages the NHWC round-trip
        # between them (channel<->spatial transposes, ~4 ms/step in the
        # round-2b trace) is replaced by lane-local plane ops: plane-layout
        # max-pool between Conv1->Conv2, direct plane reuse of e1/e2 as the
        # Up_conv2/Up_conv3 skips, pooled-then-transposed NHWC into Conv3,
        # and a plane-layout Deconv_1x1. Any tap/`until` on a chained layer
        # statically disables that link (taps stay f32 NHWC).
        from ..ops.pallas.convblock import (from_planes, plane_maxpool,
                                            plane_maxpool_to_nhwc,
                                            stage_geometry)
        B, H, W, Cin = x.shape
        H2, W2 = H // 2, W // 2
        bn = self.norm == "batchnorm"
        c1, c2 = self.get_channel_dim("Conv1"), self.get_channel_dim("Conv2")
        cu3, cu2 = (self.get_channel_dim("Up_conv3"),
                    self.get_channel_dim("Up_conv2"))

        # the plane stages run in BOTH modes (round 3): train forms batch
        # statistics in-kernel; eval folds the running stats to a
        # per-channel affine (eval_affine) — teacher/eval/inference
        # forwards get the same kernel wins as the train step. init skips
        # kernel routing entirely (same param tree, output unused — avoids
        # pointless kernel compiles in bundle.create).
        bn = bn and not self.is_initializing()
        r1 = bn and use_pallas_stage(c1, self.dtype, (H, W), cmax=Cin)
        r2 = (bn and H % 2 == 0 and W % 2 == 0
              and use_pallas_stage(c2, self.dtype, (H2, W2), cmax=c1))
        ru3 = (bn
               and use_pallas_stage(cu3, self.dtype, (H2, W2), cmax=cu3 + c2))
        ru2 = (bn
               and use_pallas_stage(cu2, self.dtype, (H, W), cmax=cu2 + c1))
        g1 = stage_geometry(H, W, Cin, c1, 0, self.dtype) if r1 else None
        g2 = stage_geometry(H2, W2, c1, c2, 0, self.dtype) if r2 else None

        import os
        chain_ok = perf_knob("PLANE_CHAIN") != "0"

        # ---- parity-domain widest-level cluster (round 3) --------------
        # Conv1 -> maxpool and Up2 -> Up_conv2 -> Deconv_1x1 run ENTIRELY
        # as four quarter-resolution parity planes [B, 4, C, Lbuf] sharing
        # ONE geometry with the Conv2/Up_conv3 plane stages: the pool is an
        # elementwise max over the parity axis, Up2's parity outputs feed
        # Up_conv2 directly, e1's parity planes are the skip, and the only
        # interleave left is the num_classes-wide head (see
        # ops/pallas/convblock.py parity section doc). One static gate for
        # the whole cluster; any tap/until inside it falls back.
        from ..ops.pallas.convblock import (parity_pool,
                                            parity_split_to_planes,
                                            use_parity_chain)
        # forward-only applications (train=False, or an explicit fwd_only
        # hint for train-mode teacher passes under stop_gradient) default
        # INTO the parity chain — it wins forward-only (-8%) and only
        # loses when the backward pays the quarter-geometry padding
        par = (chain_ok and bn
               and "Conv1" not in taps and until != "Conv1"
               and "Up_conv2" not in taps and until != "Up_conv2"
               and use_parity_chain(Cin, c1, cu2, (H, W), self.dtype,
                                    fwd_only=fwd_only or not train))
        gq = (stage_geometry(H2, W2, cu2, cu2, c1, self.dtype)
              if par else None)
        if par and r2 and stage_geometry(H2, W2, c1, c2, 0,
                                         self.dtype) != gq:
            par = False                       # geometries must be shared
        p1 = (not par and chain_ok and r1 and H % 2 == 0 and W % 2 == 0
              and "Conv1" not in taps and until != "Conv1")
        p2 = (chain_ok and r2 and H2 % 2 == 0 and W2 % 2 == 0
              and "Conv2" not in taps and until != "Conv2")

        # ---- encoder ---------------------------------------------------
        if par:
            xq = parity_split_to_planes(x, self.dtype, gq)
            e1 = self.Conv1(xq, parity_info=(H2, W2, gq), **kw)
            x2 = parity_pool(e1)              # dense planes at gq == g2
            x2_planes = r2
            if not x2_planes:
                x2 = from_planes(x2, H2, W2, gq)
        else:
            e1 = self.Conv1(x, plane_out=p1, **kw)      # planes iff p1
            if not p1 and emit("Conv1", e1):
                return e1.astype(jnp.float32), collected
            if p1:
                x2 = (plane_maxpool(e1, H, W, g1, g2) if r2
                      else plane_maxpool_to_nhwc(e1, H, W, g1))
                x2_planes = r2
            else:
                x2 = nn.max_pool(e1, (2, 2), (2, 2))
                x2_planes = False
        e2 = self.Conv2(x2, plane_info=(H2, W2) if x2_planes else None,
                        plane_out=p2, **kw)             # planes iff p2
        if not p2 and emit("Conv2", e2):
            return e2.astype(jnp.float32), collected
        x3 = (plane_maxpool_to_nhwc(e2, H2, W2, g2) if p2
              else nn.max_pool(e2, (2, 2), (2, 2)))
        e3 = self.Conv3(x3, **kw)
        if emit("Conv3", e3):
            return e3.astype(jnp.float32), collected
        e4 = self.Conv4(nn.max_pool(e3, (2, 2), (2, 2)), **kw)
        if emit("Conv4", e4):
            return e4.astype(jnp.float32), collected
        e5 = self.Conv5(nn.max_pool(e4, (2, 2), (2, 2)), **kw)
        if emit("Conv5", e5):
            return e5.astype(jnp.float32), collected

        # ---- decoder ---------------------------------------------------
        d5 = self.Up_conv5(self.Up5(e5, **kw), skip=e4, **kw)
        if emit("Up_conv5", d5):
            return d5.astype(jnp.float32), collected
        d4 = self.Up_conv4(self.Up4(d5, **kw), skip=e3, **kw)
        if emit("Up_conv4", d4):
            return d4.astype(jnp.float32), collected

        # plane UpConvs: upsample+conv as parity plane kernels whose output
        # lands directly in the consumer ConvBlock's plane geometry
        from ..ops.pallas.convblock import use_plane_upconv
        gu3 = stage_geometry(H2, W2, cu3, cu3, c2, self.dtype)
        gu2 = stage_geometry(H, W, cu2, cu2, c1, self.dtype)
        up3_plane = (chain_ok and ru3 and H2 % 2 == 0 and W2 % 2 == 0
                     and use_plane_upconv(cu3, 2 * cu3, (H2 // 2, W2 // 2),
                                          self.dtype, tag="up3"))
        up2_plane = (not par and chain_ok and ru2
                     and use_plane_upconv(cu2, cu3, (H2, W2), self.dtype,
                                          tag="up2"))

        skip3_plane = p2 and ru3 and g2 == gu3
        if p2 and not skip3_plane:
            e2 = from_planes(e2, H2, W2, g2)
        d3in = self.Up3(d4, plane_out_geo=gu3 if up3_plane else None, **kw)
        if par:
            p_uc3 = (chain_ok and ru3 and gu3 == gq
                     and "Up_conv3" not in taps and until != "Up_conv3")
        else:
            p_uc3 = (chain_ok and ru3 and up2_plane
                     and "Up_conv3" not in taps and until != "Up_conv3")
        d3 = self.Up_conv3(d3in, skip=e2,
                           plane_info=(H2, W2) if up3_plane else None,
                           skip_is_plane=skip3_plane, plane_out=p_uc3, **kw)
        if not p_uc3 and emit("Up_conv3", d3):
            return d3.astype(jnp.float32), collected

        if par:
            # Up2 -> Up_conv2 -> head entirely in the parity domain; e1's
            # parity planes are the skip (no interleave anywhere)
            d2in = self.Up2(d3, parity_out=(H2, W2, gq),
                            plane_info=(H2, W2, gu3) if p_uc3 else None,
                            **kw)
            d2 = self.Up_conv2(d2in, skip=e1,
                               parity_info=(H2, W2, gq), **kw)
            logits = self.Deconv_1x1(
                d2, parity_info=(H2, W2, gq)).astype(jnp.float32)
            emit("Deconv_1x1", logits)
            return logits, collected

        skip2_plane = p1 and ru2 and g1 == gu2
        if p1 and not skip2_plane:
            e1 = from_planes(e1, H, W, g1)
        pu2 = (chain_ok and ru2 and "Up_conv2" not in taps
               and until != "Up_conv2")
        d2in = self.Up2(d3, plane_out_geo=gu2 if up2_plane else None,
                        plane_info=(H2, W2, gu3) if p_uc3 else None, **kw)
        d2 = self.Up_conv2(d2in, skip=e1,
                           plane_info=(H, W) if up2_plane else None,
                           skip_is_plane=skip2_plane, plane_out=pu2, **kw)
        if not pu2 and emit("Up_conv2", d2):
            return d2.astype(jnp.float32), collected

        if pu2:
            gu2 = stage_geometry(H, W, cu2, cu2, c1, self.dtype)
            logits = self.Deconv_1x1(
                d2, plane_info=(H, W, gu2)).astype(jnp.float32)
        else:
            logits = self.Deconv_1x1(d2).astype(jnp.float32)
        emit("Deconv_1x1", logits)
        return logits, collected
