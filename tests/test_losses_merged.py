"""MXU-merged dense-cluster formulation == the vmapped per-subhead one
(round-3 udaiic optimization): identical probabilities, joints and losses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.losses.discrete_mi import (iid_segmentation_loss,
                                                iid_segmentation_loss_merged)
from contrastyou_tpu.models.projectors import (DenseClusterHead,
                                               dense_cluster_probs_merged)

S, K, B, H, C = 3, 5, 2, 12, 6


@pytest.fixture(scope="module")
def head_and_feat():
    head = DenseClusterHead(num_clusters=K, num_subheads=S,
                            head_type="linear", T=1.0)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((2 * B, H, H, C)), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), feat)["params"]
    return head, params, feat


def test_merged_probs_match_module(head_and_feat):
    head, params, feat = head_and_feat
    want = head.apply({"params": params}, feat)          # [S, 2B, H, W, K]
    got = dense_cluster_probs_merged(params, feat, num_subheads=S,
                                     num_clusters=K, T=1.0)
    got5 = jnp.transpose(got.reshape(2 * B, H, H, S, K), (3, 0, 1, 2, 4))
    np.testing.assert_allclose(np.asarray(got5), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("padding", [0, 1])
def test_merged_iid_loss_matches_vmapped(head_and_feat, padding):
    head, params, feat = head_and_feat
    probs = head.apply({"params": params}, feat)
    p1, p2 = probs[:, :B], probs[:, B:]
    want = jax.vmap(lambda a, b: iid_segmentation_loss(
        a, b, padding=padding))(p1, p2)

    pm = dense_cluster_probs_merged(params, feat, num_subheads=S,
                                    num_clusters=K, T=1.0)
    got = iid_segmentation_loss_merged(pm[:B], pm[B:], num_subheads=S,
                                       num_clusters=K, padding=padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("padding", [0, 1])
def test_merged_iid_loss_grads_match(head_and_feat, padding):
    head, params, feat = head_and_feat

    def vmapped(p, f):
        probs = head.apply({"params": p}, f)
        return jax.vmap(lambda a, b: iid_segmentation_loss(
            a, b, padding=padding))(probs[:, :B], probs[:, B:]).mean()

    def merged(p, f):
        pm = dense_cluster_probs_merged(p, f, num_subheads=S,
                                        num_clusters=K, T=1.0)
        return iid_segmentation_loss_merged(
            pm[:B], pm[B:], num_subheads=S, num_clusters=K,
            padding=padding).mean()

    g1 = jax.grad(vmapped, argnums=(0, 1))(params, feat)
    g2 = jax.grad(merged, argnums=(0, 1))(params, feat)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_hook_uses_merged_and_matches(monkeypatch):
    """DiscreteMITrainHook dense loss: merged == vmapped end to end."""
    from contrastyou_tpu.engine.hooks import StepContext
    from contrastyou_tpu.hooks import DiscreteMITrainHook

    hook = DiscreteMITrainHook(name="iic", feature_name="Up_conv2",
                               num_clusters=K, num_subheads=S, padding=1)
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.float32)
    feat_tf = jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.float32)

    class _Bundle:
        def get_channel_dim(self, name):
            return C

    params, _ = hook.init(jax.random.PRNGKey(0), _Bundle())
    ctx = StepContext(bundle=None, params={}, rng=jax.random.PRNGKey(0),
                      epoch=jnp.int32(0))
    ctx.unlabeled_taps = {"Up_conv2": feat}
    ctx.unlabeled_tf_taps = {"Up_conv2": feat_tf}
    ctx.affine_transformer = lambda f, order=0: f

    monkeypatch.setenv("CONTRASTYOU_IIC_MERGED", "1")
    got, _, _ = hook.loss(ctx, params, None)
    monkeypatch.setenv("CONTRASTYOU_IIC_MERGED", "0")
    want, _, _ = hook.loss(ctx, params, None)
    assert float(got) == pytest.approx(float(want), rel=2e-4)
