import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from contrastyou_tpu.losses import (binary_dice_loss, compute_joint,
                                    compute_joint_2d,
                                    compute_joint_2d_with_padding_zeros,
                                    dice_loss, entropy_loss, iid_loss,
                                    iid_segmentation_loss, imsat_loss, jsd_div,
                                    kl_div, pui_loss, redundancy_criterion,
                                    self_paced_sup_con_loss, sup_con_loss,
                                    windowed_ncc_loss)
from contrastyou_tpu.losses.discrete_mi import (
    iid_segmentation_small_path_loss)
from contrastyou_tpu.losses.multicore import (multicore_kl_loss,
                                              reduced_simplex_from_groups,
                                              scale_grad)


def _rand_simplex(key, shape):
    return jax.nn.softmax(jax.random.normal(key, shape), axis=-1)


# --------------------------- kl family ---------------------------------


def test_entropy_uniform():
    p = jnp.full((4, 8), 1 / 8)
    assert entropy_loss(p) == pytest.approx(math.log(8), abs=1e-5)


def test_entropy_onehot_zero():
    p = jnp.eye(4)
    assert entropy_loss(p) == pytest.approx(0.0, abs=1e-5)


def test_kl_onehot_equals_cross_entropy():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (6, 5))
    probs = jax.nn.softmax(logits, axis=-1)
    labels = jnp.array([0, 1, 2, 3, 4, 0])
    onehot = jax.nn.one_hot(labels, 5)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    assert kl_div(probs, onehot) == pytest.approx(float(ce), rel=1e-4)


def test_kl_weighting():
    probs = jnp.array([[0.25, 0.75]])
    onehot = jnp.array([[0.0, 1.0]])
    unweighted = kl_div(probs, onehot)
    weighted = kl_div(probs, onehot, weight=[1.0, 1.0])
    assert unweighted == pytest.approx(float(weighted), rel=1e-6)


def test_jsd_zero_for_identical():
    p = _rand_simplex(jax.random.PRNGKey(1), (4, 3))
    assert jsd_div(p, p) == pytest.approx(0.0, abs=1e-5)
    q = _rand_simplex(jax.random.PRNGKey(2), (4, 3))
    assert float(jsd_div(p, q)) > 0


# --------------------------- contrastive -------------------------------


def test_supcon_finite_and_grad():
    key = jax.random.PRNGKey(0)
    f1 = _l2(jax.random.normal(key, (8, 16)))
    f2 = _l2(jax.random.normal(jax.random.PRNGKey(1), (8, 16)))
    target = jnp.array([0, 0, 1, 1, 2, 2, 3, 3])
    loss = sup_con_loss(f1, f2, target=target)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda a: sup_con_loss(a, f2, target=target))(f1)
    assert np.isfinite(np.asarray(g)).all()


def _l2(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def test_supcon_aligned_pairs_lower_loss():
    key = jax.random.PRNGKey(0)
    f = _l2(jax.random.normal(key, (8, 16)))
    loss_aligned = sup_con_loss(f, f)
    f_other = _l2(jax.random.normal(jax.random.PRNGKey(3), (8, 16)))
    loss_rand = sup_con_loss(f, f_other)
    assert float(loss_aligned) < float(loss_rand)


def test_self_paced_high_gamma_equals_supcon():
    key = jax.random.PRNGKey(0)
    f1 = _l2(jax.random.normal(key, (6, 8)))
    f2 = _l2(jax.random.normal(jax.random.PRNGKey(1), (6, 8)))
    target = jnp.array([0, 0, 0, 1, 1, 1])
    base = sup_con_loss(f1, f2, target=target)
    sp, metrics = self_paced_sup_con_loss(f1, f2, target=target, gamma=1e10)
    assert float(sp) == pytest.approx(float(base), rel=1e-5)
    assert metrics["downgrade_ratio"] == pytest.approx(1.0)


def test_self_paced_low_gamma_downgrades():
    key = jax.random.PRNGKey(0)
    f1 = _l2(jax.random.normal(key, (6, 8)))
    f2 = _l2(jax.random.normal(jax.random.PRNGKey(1), (6, 8)))
    target = jnp.array([0, 0, 0, 1, 1, 1])
    _, metrics = self_paced_sup_con_loss(f1, f2, target=target, gamma=0.1)
    assert float(metrics["downgrade_ratio"]) < 1.0


def test_supcon_exclude_other_pos_runs():
    f1 = _l2(jax.random.normal(jax.random.PRNGKey(0), (4, 8)))
    f2 = _l2(jax.random.normal(jax.random.PRNGKey(1), (4, 8)))
    loss = sup_con_loss(f1, f2, target=jnp.array([0, 0, 1, 1]),
                        exclude_other_pos=True)
    assert np.isfinite(float(loss))


# --------------------------- discrete MI -------------------------------


def test_compute_joint_normalized_symmetric():
    p = _rand_simplex(jax.random.PRNGKey(0), (32, 5))
    q = _rand_simplex(jax.random.PRNGKey(1), (32, 5))
    j = compute_joint(p, q)
    assert float(j.sum()) == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j.T), atol=1e-6)


def test_iid_loss_perfect_clustering():
    # deterministic, balanced, consistent assignments -> MI = log k
    k, n = 4, 64
    assign = jnp.eye(k)[jnp.arange(n) % k]
    loss, loss_no_lamb, _ = iid_loss(assign, assign)
    assert float(loss) == pytest.approx(-math.log(k), abs=1e-3)


def test_joint_2d_matmul_matches_einsum():
    x = _rand_simplex(jax.random.PRNGKey(0), (2, 8, 8, 3))
    y = _rand_simplex(jax.random.PRNGKey(1), (2, 8, 8, 3))
    jz = compute_joint_2d_with_padding_zeros(x, y, symmetric=False)[0, 0]
    n = 2 * 8 * 8
    direct = jnp.einsum("bhwi,bhwj->ij", x, y) / n
    np.testing.assert_allclose(np.asarray(jz), np.asarray(direct), atol=1e-3)
    # the matmul joint sums to 1 because each pixel is a simplex
    assert float(jz.sum()) == pytest.approx(1.0, abs=1e-3)


def test_joint_2d_conv_normalized_symmetric():
    x = _rand_simplex(jax.random.PRNGKey(0), (2, 8, 8, 3))
    y = _rand_simplex(jax.random.PRNGKey(1), (2, 8, 8, 3))
    jc = compute_joint_2d(x, y, symmetric=True, padding=1)
    assert jc.shape == (3, 3, 3, 3)
    assert float(jc.sum()) == pytest.approx(1.0, abs=1e-4)
    np.testing.assert_allclose(np.asarray(jc),
                               np.asarray(jnp.transpose(jc, (0, 1, 3, 2))),
                               atol=1e-6)


def test_iid_segmentation_loss_finite_grad():
    x = _rand_simplex(jax.random.PRNGKey(0), (2, 16, 16, 4))
    y = _rand_simplex(jax.random.PRNGKey(1), (2, 16, 16, 4))
    for padding in (0, 1):
        loss = iid_segmentation_loss(x, y, padding=padding)
        assert np.isfinite(float(loss))
    g = jax.grad(lambda a: iid_segmentation_loss(a, y, padding=1))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_iid_small_patch_loss():
    x = _rand_simplex(jax.random.PRNGKey(0), (1, 32, 32, 3))
    y = _rand_simplex(jax.random.PRNGKey(1), (1, 32, 32, 3))
    loss = iid_segmentation_small_path_loss(x, y, padding=1, patch_size=16)
    assert np.isfinite(float(loss))


def test_imsat_loss_confident_balanced_is_minimal():
    k, n = 4, 64
    confident = jnp.eye(k)[jnp.arange(n) % k]  # balanced & confident
    uniform = jnp.full((n, k), 1 / k)
    assert float(imsat_loss(confident)) < float(imsat_loss(uniform))
    assert float(imsat_loss(confident)) == pytest.approx(-math.log(k), abs=1e-3)


# --------------------------- others ------------------------------------


def test_ncc_identical_is_minus_one():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 1))
    loss = windowed_ncc_loss(x, x, win=(9, 9))
    assert float(loss) == pytest.approx(-1.0, abs=1e-2)


def test_ncc_uncorrelated_higher():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 1))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    assert float(windowed_ncc_loss(x, y)) > float(windowed_ncc_loss(x, x))


def test_redundancy_criterion_runs_and_grads():
    x = _rand_simplex(jax.random.PRNGKey(0), (2, 16, 16, 5))
    y = _rand_simplex(jax.random.PRNGKey(1), (2, 16, 16, 5))
    for alpha in (0.0, 0.5, 1.0):
        loss = redundancy_criterion(x, y, alpha=alpha)
        assert np.isfinite(float(loss))
    g = jax.grad(lambda a: redundancy_criterion(a, y, alpha=0.5))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_dice_losses():
    # NB: the reference BinaryDiceLoss (dice_loss.py:31-67) has NO factor 2 in
    # the numerator, so a perfect prediction on a present class scores
    # ~1 - (S+1)/(2S+1) ~= 0.5, not 0. We keep that behavior for parity.
    target = jax.nn.one_hot(jnp.zeros((2, 8, 8), jnp.int32), 2)
    perfect = float(dice_loss(target, target))
    pred_bad = jax.nn.one_hot(jnp.ones((2, 8, 8), jnp.int32), 2)
    bad = float(dice_loss(pred_bad, target))
    assert perfect < bad
    assert perfect == pytest.approx(0.248, abs=1e-2)
    S = 8 * 8  # per-sample flattened size (loss averages over the batch)
    expected = 1 - (S + 1) / (2 * S + 1)
    assert float(binary_dice_loss(target[..., 0], target[..., 0])) == \
        pytest.approx(expected, abs=1e-6)


def test_multicore_reduced_simplex():
    p = _rand_simplex(jax.random.PRNGKey(0), (2, 4, 4, 6))
    groups = [[0, 1], [2, 3], [4, 5]]
    r = reduced_simplex_from_groups(p, groups)
    assert r.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(r.sum(-1)), 1.0, rtol=1e-5)
    target = jax.nn.one_hot(jnp.zeros((2, 4, 4), jnp.int32), 3)
    assert np.isfinite(float(multicore_kl_loss(p, target, groups)))


def test_scale_grad():
    g = jax.grad(lambda x: scale_grad(x, 0.5).sum())(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), 0.5)


def test_pui_loss():
    p = _rand_simplex(jax.random.PRNGKey(0), (32, 4))
    q = _rand_simplex(jax.random.PRNGKey(1), (32, 4))
    assert np.isfinite(float(pui_loss(p, q)))
