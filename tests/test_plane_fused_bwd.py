"""Single-pass dx+dW plane-conv backward (CONTRASTYOU_PLANE_FUSEDBWD) ==
the split backward (dx transposed-conv call + sliced-einsum dk).

The fused kernel (ops/pallas/convblock.py ``plane_conv_bwd_fused``) reuses
the transposed-conv's cotangent patches for the weight grad — ``dk[t,i,o] =
sum_m xp[i,m] * g[o, m - off_t]`` and the symmetric 3x3 offset set makes
negation a tap reversal. dx must match the split path BIT-exactly (same
matmul); dk up to f32 accumulation order. Ref semantics: arch/unet.py:16-31
_ConvBlock weight/input grads.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import contrastyou_tpu.ops.pallas.convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


def _grads(fused: bool, H, W, cin, cout, seed=0, dyg="1"):
    os.environ["CONTRASTYOU_PLANE_FUSEDBWD"] = "1" if fused else "0"
    os.environ["CONTRASTYOU_PLANE_DYG"] = dyg
    rng = np.random.default_rng(seed)
    geo = cb.pick_geometry(H, W, max(cin, cout), 2)
    x = jnp.asarray(rng.standard_normal((3, H, W, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                    jnp.float32)
    g_np = rng.standard_normal((3, geo.lbuf - 2 * geo.mb))
    mask = cb.border_mask(H, W, geo)
    xp = cb.to_planes(x, jnp.bfloat16, geo)
    cot = jnp.pad(jnp.asarray(g_np, jnp.float32)[:, None, :].repeat(cout, 1),
                  ((0, 0), (0, 0), (geo.mb, geo.mb))).astype(jnp.bfloat16)

    def f(xp, k):
        o = cb.plane_conv(xp, k, mask, H, W, geo)
        return (o.astype(jnp.float32) * cot.astype(jnp.float32)).sum()

    _, (dx, dk) = jax.value_and_grad(f, argnums=(0, 1))(xp, k)
    return np.float32(dx), np.asarray(dk)


@pytest.mark.parametrize("cin,cout", [(16, 32), (8, 8), (32, 16)])
def test_fused_bwd_matches_split(cin, cout, monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    try:
        dx0, dk0 = _grads(False, 12, 10, cin, cout)
        dx1, dk1 = _grads(True, 12, 10, cin, cout)
    finally:
        os.environ.pop("CONTRASTYOU_PLANE_FUSEDBWD", None)
        os.environ.pop("CONTRASTYOU_PLANE_DYG", None)
    np.testing.assert_allclose(dk1, dk0, rtol=2e-5, atol=2e-4)
    # dx: same patches + same matmul as the split non-dyg path
    dx0n, _ = _grads(False, 12, 10, cin, cout, dyg="0")
    np.testing.assert_allclose(dx1, dx0n, rtol=0, atol=0)
    np.testing.assert_allclose(dx1, dx0, rtol=1e-5, atol=1e-5)


def test_fused_bwd_small_cin_falls_back(monkeypatch):
    """cin < 8 (the image conv) stays on the split path — values must agree
    regardless of the knob."""
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    try:
        dx0, dk0 = _grads(False, 12, 10, 1, 16)
        dx1, dk1 = _grads(True, 12, 10, 1, 16)
    finally:
        os.environ.pop("CONTRASTYOU_PLANE_FUSEDBWD", None)
        os.environ.pop("CONTRASTYOU_PLANE_DYG", None)
    np.testing.assert_allclose(dx1, dx0, rtol=0, atol=0)
    np.testing.assert_allclose(dk1, dk0, rtol=0, atol=0)


def test_fused_bwd_nonsquare_and_odd(monkeypatch):
    """Odd sizes exercise the ppad tail: the dk contraction must see zeros
    there (g is masked), not garbage."""
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    try:
        dx0, dk0 = _grads(False, 9, 13, 8, 16, seed=3)
        dx1, dk1 = _grads(True, 9, 13, 8, 16, seed=3)
    finally:
        os.environ.pop("CONTRASTYOU_PLANE_FUSEDBWD", None)
        os.environ.pop("CONTRASTYOU_PLANE_DYG", None)
    np.testing.assert_allclose(dk1, dk0, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(dx1, dx0, rtol=1e-5, atol=1e-5)
