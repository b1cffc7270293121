"""Gather-free nearest warp (round 3): the TPU backend runs the warp
gathers at ~100M indices/s (5.4 ms/step, the largest single source line in
the round-3 trace), so order-0 zeros-padding warps route through a two-pass
decomposition (ops/affine.py ``_apply_geometric_fast``): per-row integer
barrel shifts + three shared one-hot MXU resamples per pass.

The fast warp is an EQUIVALENT augmentation, not a bit-identical one: the
horizontal index may differ from the single-gather nearest map by 1 px
where the rounded row disagrees with the exact row. These tests pin the
contract: exactness for the separable cases, zeros padding, determinism,
high pixel agreement at reference parameter ranges, and gradient flow.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.ops import affine as af

B, H, W = 4, 64, 64


@pytest.fixture(autouse=True)
def _fast(monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_FAST_WARP", "1")


@pytest.fixture()
def img():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)


def _mk(**kw):
    z = jnp.zeros((B,))
    base = dict(scale=jnp.ones((B,)), angle=z, tx=z, ty=z,
                flip_h=jnp.zeros((B,), bool), flip_w=jnp.zeros((B,), bool))
    base.update(kw)
    return af.GeoParams(**base)


def _gather(imgs, params):
    os.environ["CONTRASTYOU_FAST_WARP"] = "0"
    try:
        return af.apply_geometric(imgs, params, order=0)
    finally:
        os.environ["CONTRASTYOU_FAST_WARP"] = "1"


def test_identity_exact(img):
    out = af.apply_geometric(img, af.identity_geo_params(B), order=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_separable_cases_match_gather_exactly(img):
    for params in (_mk(tx=jnp.full((B,), 0.13), ty=jnp.full((B,), -0.07)),
                   _mk(scale=jnp.full((B,), 1.2)),
                   _mk(scale=jnp.full((B,), 0.85)),
                   _mk(flip_h=jnp.ones((B,), bool)),
                   _mk(flip_w=jnp.ones((B,), bool))):
        fast = af.apply_geometric(img, params, order=0)
        ref = _gather(img, params)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))


def test_agreement_at_reference_ranges(img):
    params = af.sample_geo_params(jax.random.PRNGKey(3), B)
    fast = af.apply_geometric(img, params, order=0)
    ref = _gather(img, params)
    agree = np.mean(np.asarray(fast) == np.asarray(ref))
    assert agree > 0.75, agree
    # mismatches are single-pixel substitutions, never invented values:
    # every fast output value exists in the input or is the padding zero
    pool = set(np.asarray(img).ravel().tolist()) | {0.0}
    diff = np.asarray(fast)[np.asarray(fast) != np.asarray(ref)]
    assert all(v in pool for v in diff.ravel().tolist())


def test_zeros_padding_outside(img):
    rot = _mk(angle=jnp.full((B,), 0.7))
    out = np.asarray(af.apply_geometric(img + 10.0, rot, order=0))
    # corners rotate out of range -> exactly zero
    assert out[0, 0, 0, 0] == 0.0 and out[0, -1, -1, 0] == 0.0
    assert out[0, 0, -1, 0] == 0.0 and out[0, -1, 0, 0] == 0.0


def test_same_params_same_warp_image_vs_logits(img):
    """The consistency contract: transform_image (geometry part) and
    transform_logits with the SAME GeoParams displace pixels identically."""
    params = af.sample_geo_params(jax.random.PRNGKey(5), B)
    coord = jnp.tile(jnp.arange(H * W, dtype=jnp.float32
                                ).reshape(1, H, W, 1) + 7.0, (B, 1, 1, 1))
    a = af.apply_geometric(coord, params, order=0)
    b = af.transform_logits(coord, params)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_deterministic_and_jittable(img):
    params = af.sample_geo_params(jax.random.PRNGKey(9), B)
    f = jax.jit(lambda x: af.apply_geometric(x, params, order=0))
    np.testing.assert_array_equal(np.asarray(f(img)), np.asarray(f(img)))


def test_gradients_flow(img):
    params = af.sample_geo_params(jax.random.PRNGKey(11), B)

    def loss(x):
        return (af.transform_logits(x, params) ** 2).sum()

    g = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    # the warp is a (partial) permutation: d/dx sum(T(x)) counts how many
    # output pixels read each input pixel -> integer-valued gradient
    g1 = jax.grad(lambda x: af.transform_logits(x, params).sum())(img)
    np.testing.assert_allclose(np.asarray(g1), np.round(np.asarray(g1)),
                               atol=1e-5)


def test_non_square_falls_back_to_gather():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, 32, 64, 1)), jnp.float32)
    params = af.sample_geo_params(jax.random.PRNGKey(1), B)
    out = af.apply_geometric(x, params, order=0)       # fast gate skips
    ref = _gather(x, params)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_extreme_angle_stays_bounded(img):
    big = _mk(angle=jnp.full((B,), 1.45))              # ~83 deg, |d| guard
    out = np.asarray(af.apply_geometric(img, big, order=0))
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= np.abs(np.asarray(img)).max() + 1e-6


def test_onehot_pass_matches_barrel_exactly():
    """Round-5: wide-channel maps route the 1-D passes through a one-hot
    MXU contraction (CONTRASTYOU_WARP_ONEHOT) — each output is exactly one
    input value, so the two forms must agree BITWISE, at every channel
    width and for both float dtypes."""
    rng = np.random.default_rng(7)
    params = af.sample_geo_params(jax.random.PRNGKey(11), B)
    for C, dtype in ((8, jnp.float32), (32, jnp.float32), (32, jnp.bfloat16)):
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
        os.environ["CONTRASTYOU_WARP_ONEHOT"] = "1"
        try:
            onehot = af.apply_geometric(x, params, order=0)
        finally:
            os.environ["CONTRASTYOU_WARP_ONEHOT"] = "0"
        try:
            barrel = af.apply_geometric(x, params, order=0)
        finally:
            del os.environ["CONTRASTYOU_WARP_ONEHOT"]
        assert onehot.dtype == dtype
        np.testing.assert_array_equal(np.asarray(onehot, np.float32),
                                      np.asarray(barrel, np.float32),
                                      err_msg=f"C={C} {dtype}")


def test_onehot_pass_auto_routing_and_grads():
    """Auto mode: C>=8 routes one-hot (same values as the barrel path) and
    gradients flow through the einsum form."""
    rng = np.random.default_rng(8)
    params = af.sample_geo_params(jax.random.PRNGKey(12), B)
    x = jnp.asarray(rng.standard_normal((B, H, W, 16)), jnp.float32)
    auto = af.apply_geometric(x, params, order=0)       # auto: one-hot
    os.environ["CONTRASTYOU_WARP_ONEHOT"] = "0"
    try:
        barrel = af.apply_geometric(x, params, order=0)
    finally:
        del os.environ["CONTRASTYOU_WARP_ONEHOT"]
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(barrel))
    g = jax.grad(lambda xx: (af.apply_geometric(xx, params, order=0) ** 2)
                 .sum())(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
