"""128-aligned plane row stride (round 3): when the padding waste is
acceptable, pick_geometry pads each plane row to a 128-lane multiple so the
[B,C,Lbuf] <-> [B,C,H+2,rs] row splits in the stage-chaining glue become
free bitcasts (the round-3 step trace put those re-tiling copies at
~8 ms/step at 224^2).

These tests run the ALIGNED geometry (W=100 -> rs=128, vs the legacy stride
102) through the same equivalence checks the legacy suites use, in interpret
mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.ops.pallas import convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)

H, W = 12, 100   # aligned: rs=128 (128 <= 1.5*102); legacy: rs=102


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    cb._partitioned_conv.cache_clear()
    yield
    cb._partitioned_conv.cache_clear()


def _xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_pick_geometry_alignment_rules():
    g = cb.pick_geometry(224, 224, 32, 2, align=True)
    assert (g.rs, g.pad) == (256, 384) and g.P == 226 * 256
    g = cb.pick_geometry(112, 112, 64, 2, align=True)
    assert (g.rs, g.pad) == (128, 256)
    # waste cap: 56^2 would pay 128/58 = 2.2x -> stays legacy
    g = cb.pick_geometry(56, 56, 128, 2, align=True)
    assert g.rs == 58
    g = cb.pick_geometry(224, 224, 32, 2, align=False)
    assert g.rs == 226 and g.pad == 256
    # knob off forces legacy everywhere
    import os
    old = os.environ.pop("CONTRASTYOU_PLANE_ALIGN", None)
    os.environ["CONTRASTYOU_PLANE_ALIGN"] = "0"
    try:
        assert cb.pick_geometry(224, 224, 32, 2).rs == 226
    finally:
        if old is None:
            del os.environ["CONTRASTYOU_PLANE_ALIGN"]
        else:
            os.environ["CONTRASTYOU_PLANE_ALIGN"] = old


def test_aligned_conv_matches_xla():
    geo = cb.pick_geometry(H, W, 8, 4, align=True)
    assert geo.rs == 128, geo
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H, W, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.float32)
    xp = cb.to_planes(x, jnp.float32, geo)
    mask = cb.border_mask(H, W, geo)
    out, part = cb.conv_plane_geo(xp, cb.fold_kernel(k), mask, H, W, geo=geo)
    got = cb.from_planes(out, H, W, geo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv(x, k)),
                               rtol=1e-5, atol=1e-5)
    # kernel stat partials match the masked output stats
    s = np.asarray(part.sum((0, 1)))
    ref = np.asarray(_xla_conv(x, k))
    np.testing.assert_allclose(s[0], ref.sum((0, 1, 2)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(s[1], (ref ** 2).sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-4)


def test_aligned_conv_grads_match_xla():
    geo = cb.pick_geometry(H, W, 8, 4, align=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, H, W, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.float32)
    mask = cb.border_mask(H, W, geo)

    def f_plane(x, k):
        xp = cb.to_planes(x, jnp.float32, geo)
        y = cb.plane_conv(xp, k, mask, H, W, geo)
        return (cb.from_planes(y, H, W, geo) ** 2).mean()

    def f_xla(x, k):
        return (_xla_conv(x, k) ** 2).mean()

    gx0, gk0 = jax.grad(f_xla, (0, 1))(x, k)
    gx1, gk1 = jax.grad(f_plane, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0),
                               rtol=1e-4, atol=1e-5)


def test_aligned_maxpool_matches_nhwc():
    import flax.linen as nn
    geo_in = cb.pick_geometry(H, W, 8, 4, align=True)
    geo_out = cb.pick_geometry(H // 2, W // 2, 8, 4, align=True)
    assert geo_in.rs == 128 and geo_out.rs == 52  # 52 = W/2+2 (ratio > 1.5)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, H, W, 8)), jnp.float32)
    xp = cb.to_planes(x, jnp.float32, geo_in)
    want = nn.max_pool(x, (2, 2), (2, 2))
    got_p = cb.plane_maxpool(xp, H, W, geo_in, geo_out)
    np.testing.assert_allclose(
        np.asarray(cb.from_planes(got_p, H // 2, W // 2, geo_out)),
        np.asarray(want), rtol=0, atol=0)
    # guards/borders/dead lanes of the output are exactly zero
    m = cb.border_mask(H // 2, W // 2, geo_out)
    np.testing.assert_array_equal(
        np.asarray(got_p * (1 - m[None])), 0.0)
    got_n = cb.plane_maxpool_to_nhwc(xp, H, W, geo_in)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want),
                               rtol=0, atol=0)


def test_aligned_upconv_matches_xla():
    from contrastyou_tpu.models.unet import conv3x3_on_upsampled
    cin, cout = 8, 8
    geo_in = cb.pick_geometry(H, W, max(cin, cout), 4, align=True)
    geo_out = cb.pick_geometry(2 * H, 2 * W, cout, 4, align=True)
    assert geo_in.rs == 128 and geo_out.rs == 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                     jnp.float32)
    xp = cb.to_planes(x, jnp.float32, geo_in)
    out_p, ssum, ssq = cb.upconv_plane(xp, k3, H, W, geo_in, geo_out)
    got = cb.from_planes(out_p, 2 * H, 2 * W, geo_out)
    want = conv3x3_on_upsampled(x, k3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ssum.sum(0)),
                               np.asarray(want).sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-3)


def test_aligned_stage_matches_xla_stage():
    """convblock_stage end-to-end (conv-bn-relu x2 + skip) on the aligned
    geometry == the legacy-stride stage (same math, different layout)."""
    cin, cout, cs = 8, 8, 8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, H, W, cs)), jnp.float32)
    k0 = jnp.asarray(rng.standard_normal((3, 3, cin + cs, cout)) * 0.2,
                     jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, cout, cout)) * 0.2,
                     jnp.float32)
    ones, zeros = jnp.ones((cout,)), jnp.zeros((cout,))

    outs = []
    for align in (False, True):
        cb._pick_geometry.cache_clear()
        import os
        os.environ["CONTRASTYOU_PLANE_ALIGN"] = "1" if align else "0"
        try:
            y, (mv0, mv1) = cb.convblock_stage(
                x, skip, k0, k1, (ones, zeros), (ones, zeros),
                dtype=jnp.float32)
            outs.append((y, mv0, mv1))
        finally:
            del os.environ["CONTRASTYOU_PLANE_ALIGN"]
    (y0, a0, b0), (y1, a1, b1) = outs
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)
    for u, w in zip(jax.tree.leaves((a0, b0)), jax.tree.leaves((a1, b1))):
        np.testing.assert_allclose(np.asarray(u), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)
