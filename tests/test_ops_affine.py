import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.ops import (apply_flips, apply_gamma, apply_geometric,
                                 gaussian_noise, identity_geo_params,
                                 random_cutout, sample_geo_params,
                                 transform_image, transform_logits)


def _img(key, B=2, H=32, W=32, C=1):
    return jax.random.uniform(key, (B, H, W, C))


def test_identity_params_roundtrip():
    x = _img(jax.random.PRNGKey(0))
    params = identity_geo_params(2)
    out = apply_geometric(x, params, order=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_identity_nearest_exact():
    x = _img(jax.random.PRNGKey(0))
    out = apply_geometric(x, identity_geo_params(2), order=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_flips_involution():
    x = _img(jax.random.PRNGKey(0))
    params = identity_geo_params(2)._replace(
        flip_h=jnp.array([True, False]), flip_w=jnp.array([False, True]))
    twice = apply_flips(apply_flips(x, params), params)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(x))


def test_equivariance_same_params():
    """The core contract: T applied to image == T applied to 'logits' when both
    use the same params (here f = identity network)."""
    key = jax.random.PRNGKey(0)
    x = _img(key, B=4, H=64, W=64, C=3)
    params = sample_geo_params(jax.random.PRNGKey(1), 4)
    a = apply_geometric(x, params, order=0)
    b = transform_logits(x, params, order=0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_transform_deterministic_given_key():
    x = _img(jax.random.PRNGKey(0), B=3)
    params = sample_geo_params(jax.random.PRNGKey(7), 3)
    k = jax.random.PRNGKey(9)
    out1 = transform_image(x, params, k)
    out2 = transform_image(x, params, k)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_per_sample_params_differ():
    x = jnp.tile(_img(jax.random.PRNGKey(0), B=1), (4, 1, 1, 1))
    params = sample_geo_params(jax.random.PRNGKey(3), 4)
    out = np.asarray(apply_geometric(x, params, order=1))
    assert not np.allclose(out[0], out[1])


def test_rotation_90_matches_rot90():
    # 90° rotation of a symmetric-size image equals np.rot90 up to sampling
    x = _img(jax.random.PRNGKey(0), B=1, H=16, W=16)
    params = identity_geo_params(1)._replace(angle=jnp.array([jnp.pi / 2]))
    out = np.asarray(apply_geometric(x, params, order=0))[0, ..., 0]
    expected = np.rot90(np.asarray(x)[0, ..., 0], k=-1)
    # straight 90° with nearest sampling should be an exact permutation
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_gamma_range_and_clip():
    x = _img(jax.random.PRNGKey(0)) * 2.0 - 0.5  # outside [0,1]
    out = apply_gamma(x, jax.random.PRNGKey(1))
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_zero_padding_outside():
    x = jnp.ones((1, 16, 16, 1))
    params = identity_geo_params(1)._replace(tx=jnp.array([1.0]))  # shift half
    out = np.asarray(apply_geometric(x, params, order=0))
    assert out.min() == 0.0  # zeros revealed at the border
    assert out.max() == 1.0


def test_cutout_and_noise():
    x = jnp.ones((2, 32, 32, 1))
    cut = random_cutout(x, jax.random.PRNGKey(0), size=(8, 8))
    assert float(cut.sum()) == pytest.approx(2 * (32 * 32 - 64))
    noised = gaussian_noise(x, jax.random.PRNGKey(1), std=0.1)
    assert not np.allclose(np.asarray(noised), np.asarray(x))


def test_jit_compatible():
    @jax.jit
    def fn(x, key):
        params = sample_geo_params(key, x.shape[0])
        return transform_image(x, params, key), transform_logits(x, params)

    x = _img(jax.random.PRNGKey(0))
    a, b = fn(x, jax.random.PRNGKey(5))
    assert a.shape == x.shape and b.shape == x.shape


def test_color_jitter():
    from contrastyou_tpu.ops import color_jitter
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, 16, 16, 1)) * 0.5 + 0.25
    out = color_jitter(x, jax.random.PRNGKey(1), brightness=0.3, contrast=0.3)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert not np.allclose(np.asarray(out), np.asarray(x))
    # per-sample factors differ
    d0 = np.abs(np.asarray(out[0] - x[0])).mean()
    d1 = np.abs(np.asarray(out[1] - x[1])).mean()
    assert abs(d0 - d1) > 1e-5


def test_edge_padding_no_zeros():
    x = jnp.ones((1, 16, 16, 1))
    params = identity_geo_params(1)._replace(tx=jnp.array([1.0]))
    out = np.asarray(apply_geometric(x, params, order=0, padding="edge"))
    assert out.min() == 1.0  # clamped, no black border
