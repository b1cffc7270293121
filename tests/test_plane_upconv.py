"""Parity-decomposed plane UpConv (round 3): upsample2x_nearest + conv3x3
computed as four quarter-resolution 2x2-tap plane convs
(ops/pallas/convblock.py ``upconv_plane``) must match the XLA formulation
(models/unet.py ``conv3x3_on_upsampled``) in outputs, BN batch statistics,
and gradients.

Runs in interpret mode on CPU (CONTRASTYOU_PALLAS_CONV=1), f32 — the same
code path that compiles for TPU. Ref semantics: arch/unet.py:34-47 up_conv.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.models.unet import UNet, UpConv, conv3x3_on_upsampled
from contrastyou_tpu.ops.pallas import convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


@pytest.fixture(autouse=True)
def _force_pallas(monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")


def _geo(H, W, cmax):
    return cb.pick_geometry(H, W, cmax, 4)


@pytest.mark.parametrize("ilv2", ["0", "1"])
def test_upconv_plane_matches_xla_forward(ilv2, monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_PLANE_ILV2", ilv2)
    rng = np.random.default_rng(0)
    B, H, W, cin, cout = 2, 6, 10, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                     jnp.float32)
    ref = conv3x3_on_upsampled(x, k3)                    # [B, 2H, 2W, cout]

    geo_in = _geo(H, W, max(cin, cout))
    geo_out = _geo(2 * H, 2 * W, cout)
    xp = cb.to_planes(x, jnp.float32, geo_in)
    out_p, ssum, ssq = cb.upconv_plane(xp, k3, H, W, geo_in, geo_out)
    got = cb.from_planes(out_p, 2 * H, 2 * W, geo_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # stat partials sum to the true per-sample masked sums of the output
    reff = np.asarray(ref, np.float64)
    np.testing.assert_allclose(np.asarray(ssum),
                               reff.sum((1, 2)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ssq),
                               (reff ** 2).sum((1, 2)), rtol=1e-4, atol=1e-4)
    # borders/guards of the output planes must be exactly zero
    m = cb.border_mask(2 * H, 2 * W, geo_out)
    np.testing.assert_array_equal(np.asarray(out_p * (1 - m[None])), 0.0)


def test_upconv_plane_grads_match_xla():
    rng = np.random.default_rng(1)
    B, H, W, cin, cout = 2, 6, 6, 4, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                     jnp.float32)
    wloss = jnp.asarray(rng.standard_normal((B, 2 * H, 2 * W, cout)),
                        jnp.float32)
    geo_in = _geo(H, W, max(cin, cout))
    geo_out = _geo(2 * H, 2 * W, cout)

    def loss_ref(xx, kk):
        y = conv3x3_on_upsampled(xx, kk)
        return jnp.sum(y * wloss) + jnp.sum(y.sum((1, 2)) ** 2) \
            + jnp.sum((y ** 2).sum((1, 2)))

    def loss_plane(xx, kk):
        xp = cb.to_planes(xx, jnp.float32, geo_in)
        out_p, ssum, ssq = cb.upconv_plane(xp, kk, H, W, geo_in, geo_out)
        y = cb.from_planes(out_p, 2 * H, 2 * W, geo_out)
        return jnp.sum(y * wloss) + jnp.sum(ssum ** 2) + jnp.sum(ssq)

    g0 = jax.grad(loss_ref, (0, 1))(x, k3)
    g1 = jax.grad(loss_plane, (0, 1))(x, k3)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def _fwd(model, v, x, **kw):
    return model.apply(v, x, train=True, mutable=["batch_stats"], **kw)


def test_upconv_module_plane_path_matches_xla():
    """The UpConv module: NHWC input -> plane output (plane_out_geo) must
    equal the XLA path's BN+ReLU output and produce identical running-stat
    updates, including per-group statistics."""
    rng = np.random.default_rng(2)
    B, H, W, cin, cout = 3, 8, 8, 16, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    mod = UpConv(cout, momentum=0.1, dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x, train=True)
    geo_out = _geo(2 * H, 2 * W, cout)

    for groups, upd in ((None, None), ((1, 2), (True, False))):
        y0, mut0 = _fwd(mod, v, x, bn_groups=groups, bn_update=upd)
        yp, mut1 = _fwd(mod, v, x, bn_groups=groups, bn_update=upd,
                        plane_out_geo=geo_out)
        y1 = cb.from_planes(yp, 2 * H, 2 * W, geo_out)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)
        for a, b in zip(jax.tree.leaves(mut1), jax.tree.leaves(mut0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_unet_upconv_knob_off_matches(monkeypatch):
    """CONTRASTYOU_PLANE_UPCONV=0 (A/B knob) statically falls back to the
    NHWC-interleaved UpConvs without changing results or BN stats."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 momentum=0.1, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    monkeypatch.setenv("CONTRASTYOU_PLANE_UPCONV", "0")
    (y0, _), mut0 = _fwd(model, v, x)
    monkeypatch.setenv("CONTRASTYOU_PLANE_UPCONV", "1")
    (y1, _), mut1 = _fwd(model, v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(mut1), jax.tree.leaves(mut0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("upvjp", ["0", "1"])
def test_upconv_interleave_custom_vjp_bit_identical(upvjp, monkeypatch):
    """The hand-written interleave transpose (CONTRASTYOU_PLANE_UPVJP,
    round 3) is a pure permutation — outputs AND input/kernel gradients
    must be BIT-identical to the AD transpose it replaces."""
    rng = np.random.default_rng(4)
    B, H, W, cin, cout = 2, 6, 10, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                     jnp.float32)
    g_seed = jnp.asarray(rng.standard_normal((B, 2 * H, 2 * W, cout)),
                         jnp.float32)
    geo_in = _geo(H, W, max(cin, cout))
    geo_out = _geo(2 * H, 2 * W, cout)
    monkeypatch.setenv("CONTRASTYOU_PLANE_ILV2", "1")

    def run():
        def f(xx, kk):
            xp = cb.to_planes(xx, jnp.float32, geo_in)
            out_p, ssum, ssq = cb.upconv_plane(xp, kk, H, W, geo_in, geo_out)
            out = cb.from_planes(out_p, 2 * H, 2 * W, geo_out)
            return (out * g_seed).sum() + ssum.sum() * 0.1 + ssq.sum() * 0.01

        val, (dx, dk) = jax.value_and_grad(f, argnums=(0, 1))(x, k3)
        return np.asarray(val), np.asarray(dx), np.asarray(dk)

    monkeypatch.setenv("CONTRASTYOU_PLANE_UPVJP", "0")
    v0, dx0, dk0 = run()
    monkeypatch.setenv("CONTRASTYOU_PLANE_UPVJP", "1")
    v1, dx1, dk1 = run()
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_array_equal(dx1, dx0)
    np.testing.assert_array_equal(dk1, dk0)
