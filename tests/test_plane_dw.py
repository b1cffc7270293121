"""Weight-grad plane kernel (CONTRASTYOU_PLANE_DW) == sliced-einsum dk.

The fused dW kernel (ops/pallas/convblock.py ``plane_conv_dw``) builds the
forward kernel's tap-major patches from the residual input planes and
contracts them with the masked cotangent in one MXU dot per row band — it
must match the XLA form (9 sliced ``bim,bom->io`` einsums) up to bf16
accumulation order, for the 3x3 stencil (plane_conv / plane_conv_stats)
AND the parity tap sets (plane_conv_taps_stats). Ref semantics:
arch/unet.py:16-31 _ConvBlock weight grads.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import contrastyou_tpu.ops.pallas.convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


def _grads_3x3(dw: bool, H, W, cin, cout, seed=0):
    os.environ["CONTRASTYOU_PLANE_DW"] = "1" if dw else "0"
    rng = np.random.default_rng(seed)
    geo = cb.pick_geometry(H, W, max(cin, cout), 2)
    x = jnp.asarray(rng.standard_normal((3, H, W, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                    jnp.float32)
    g_np = rng.standard_normal((3, geo.lbuf - 2 * geo.mb))
    mask = cb.border_mask(H, W, geo)
    xp = cb.to_planes(x, jnp.bfloat16, geo)
    # a fixed, position-dependent cotangent exercises every tap offset
    cot = jnp.pad(jnp.asarray(g_np, jnp.float32)[:, None, :].repeat(cout, 1),
                  ((0, 0), (0, 0), (geo.mb, geo.mb))).astype(jnp.bfloat16)

    def f(xp, k):
        o = cb.plane_conv(xp, k, mask, H, W, geo)
        return (o.astype(jnp.float32) * cot.astype(jnp.float32)).sum()

    _, (dx, dk) = jax.value_and_grad(f, argnums=(0, 1))(xp, k)
    return np.float32(dx), np.asarray(dk)


@pytest.mark.parametrize("cin,cout", [(16, 32), (1, 16), (4, 8)])
def test_plane_conv_dw_matches_einsum(cin, cout, monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    try:
        dx0, dk0 = _grads_3x3(False, 12, 10, cin, cout)
        dx1, dk1 = _grads_3x3(True, 12, 10, cin, cout)
    finally:
        os.environ.pop("CONTRASTYOU_PLANE_DW", None)
    np.testing.assert_allclose(dx1, dx0, rtol=0, atol=0)
    np.testing.assert_allclose(dk1, dk0, rtol=2e-5, atol=2e-4)


def _grads_taps(dw: bool, seed=1):
    os.environ["CONTRASTYOU_PLANE_DW"] = "1" if dw else "0"
    rng = np.random.default_rng(seed)
    H, W, cin, cout = 8, 12, 8, 16
    geo = cb.pick_geometry(H, W, max(cin, cout), 2)
    x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.bfloat16)
    taps = jnp.asarray(rng.standard_normal((4, cin, cout)) * 0.3,
                       jnp.float32)
    offsets = (-geo.rs - 1, -geo.rs, -1, 0)       # a 2x2 parity-style set
    mask = cb.border_mask(H, W, geo)
    xp = cb.to_planes(x, jnp.bfloat16, geo)

    def f(xp, taps):
        o, s, sq = cb.plane_conv_taps_stats(xp, taps, mask, H, W, geo,
                                            offsets)
        return ((o.astype(jnp.float32) * mask[None]).sum()
                + s.sum() + 0.1 * sq.sum())

    _, (dx, dt) = jax.value_and_grad(f, argnums=(0, 1))(xp, taps)
    return np.float32(dx), np.asarray(dt)


def test_plane_taps_dw_matches_einsum(monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    try:
        dx0, dt0 = _grads_taps(False)
        dx1, dt1 = _grads_taps(True)
    finally:
        os.environ.pop("CONTRASTYOU_PLANE_DW", None)
    np.testing.assert_allclose(dx1, dx0, rtol=0, atol=0)
    np.testing.assert_allclose(dt1, dt0, rtol=2e-5, atol=2e-4)
