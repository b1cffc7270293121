import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from contrastyou_tpu.models import (ClusterHead, DenseClusterHead,
                                    DenseProjectionHead, Discriminator,
                                    ProjectionHead, UNet, get_arch,
                                    trainable_mask)  # noqa: F401
from contrastyou_tpu.models._base import (arch_order, complete_arch_start2end,
                                          sort_arch)


@pytest.fixture(scope="module")
def unet_and_vars():
    model = UNet(input_dim=1, num_classes=4, max_channel=128, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((2, 64, 64, 1)),
                           train=False)
    return model, variables


def test_unet_forward_shape(unet_and_vars):
    model, variables = unet_and_vars
    x = jnp.ones((2, 64, 64, 1))
    (logits, taps), _ = model.apply(variables, x, train=True,
                                    mutable=["batch_stats"])
    assert logits.shape == (2, 64, 64, 4)
    assert logits.dtype == jnp.float32
    assert taps == {}


def test_unet_param_tree_named_layers(unet_and_vars):
    _, variables = unet_and_vars
    assert set(variables["params"].keys()) == set(UNet.arch_elements)


def test_unet_partial_forward(unet_and_vars):
    model, variables = unet_and_vars
    x = jnp.ones((2, 64, 64, 1))
    e5, _ = model.apply(variables, x, until="Conv5", train=False)
    assert e5.shape == (2, 4, 4, 128)  # 64/16, channels = 16/16*128
    d2, _ = model.apply(variables, x, until="Up_conv2", train=False)
    assert d2.shape == (2, 64, 64, 8)


def test_unet_taps(unet_and_vars):
    model, variables = unet_and_vars
    x = jnp.ones((2, 64, 64, 1))
    logits, taps = model.apply(variables, x, taps=("Conv5", "Up_conv2"),
                               train=False)
    assert set(taps) == {"Conv5", "Up_conv2"}
    assert taps["Conv5"].shape == (2, 4, 4, 128)
    assert logits.shape == (2, 64, 64, 4)


def test_unet_channel_dims():
    m = UNet(num_classes=4, max_channel=512)
    assert m.get_channel_dim("Conv5") == 512
    assert m.get_channel_dim("Conv1") == 32
    assert m.get_channel_dim("Deconv_1x1") == 4


def test_arch_order_algebra():
    els = UNet.arch_elements
    assert arch_order("Conv1", elements=els) == 0
    assert sort_arch(["Up_conv2", "Conv3"], elements=els) == ["Conv3", "Up_conv2"]
    rng = complete_arch_start2end("Conv5", "Up_conv5", elements=els)
    assert rng == ["Conv5", "Up5", "Up_conv5"]
    rng2 = complete_arch_start2end("Conv5", "Up_conv5", elements=els,
                                   include_start=False)
    assert rng2 == ["Up5", "Up_conv5"]


def test_trainable_mask_freeze_after(unet_and_vars):
    _, variables = unet_and_vars
    params = variables["params"]
    # freeze everything AFTER Conv5 (pretrain-encoder semantics, main.py:96)
    mask = trainable_mask(params, elements=UNet.arch_elements, enable=False,
                          start="Conv5", include_start=False)
    leaves_conv1 = jax.tree.leaves(mask["Conv1"])
    leaves_up5 = jax.tree.leaves(mask["Up5"])
    leaves_deconv = jax.tree.leaves(mask["Deconv_1x1"])
    assert all(leaves_conv1) and all(v is True for v in jax.tree.leaves(mask["Conv5"]))
    assert not any(leaves_up5) and not any(leaves_deconv)
    # mask must drive an actually-freezing optimizer
    from contrastyou_tpu.models.masks import masked_optimizer
    tx = masked_optimizer(optax.sgd(1e-2), mask)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(jax.tree.leaves(updates["Up5"])[0]).sum()) == 0.0
    assert float(jnp.abs(jax.tree.leaves(updates["Conv1"])[0]).sum()) > 0.0


def test_projection_head_normalized():
    head = ProjectionHead(output_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 16))
    vars_ = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(vars_, x)
    assert out.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_dense_projection_head_grid():
    head = DenseProjectionHead(output_dim=16, spatial_size=(4, 4))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
    vars_ = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(vars_, x)
    assert out.shape == (2, 4, 4, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_dense_projection_pool_early_matches_reference_order(monkeypatch):
    """POOL_EARLY commutes the output 1x1 conv with adaptive avg pooling —
    value AND grad must match the reference convs-then-pool order (float
    reassociation only).  Non-divisible grids exercise the torch-style
    uneven pooling bins; max pooling must be left untouched."""
    for pool, hw in (("adaptive_avg", 16), ("adaptive_avg", 15),
                     ("adaptive_max", 16)):
        head = DenseProjectionHead(output_dim=16, spatial_size=(4, 4),
                                   pool_name=pool)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, 8))
        vars_ = head.init(jax.random.PRNGKey(0), x)

        def loss(v, xx):
            return (head.apply(v, xx) ** 2).sum()

        outs = {}
        for knob in ("1", "0"):
            monkeypatch.setenv("CONTRASTYOU_POOL_EARLY", knob)
            outs[knob] = (head.apply(vars_, x),
                          jax.grad(loss, argnums=(0, 1))(vars_, x))
        np.testing.assert_allclose(np.asarray(outs["1"][0]),
                                   np.asarray(outs["0"][0]),
                                   atol=2e-6, err_msg=pool)
        for g1, g0 in zip(jax.tree.leaves(outs["1"][1]),
                          jax.tree.leaves(outs["0"][1])):
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                       atol=2e-5, err_msg=pool)


def test_dense_projection_pool_early_linear_bf16_upcasts(monkeypatch):
    """A linear head has no hidden conv to promote bf16 features to f32, so
    the early pool must upcast before accumulating spatial means (advisor
    r4): the bf16-input result must track the f32-input result to f32-mean
    accuracy, not bf16-mean accuracy."""
    monkeypatch.setenv("CONTRASTYOU_POOL_EARLY", "1")
    head = DenseProjectionHead(output_dim=16, head_type="linear",
                               spatial_size=(2, 2), normalize=False)
    x32 = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 8)) * 100.0
    vars_ = head.init(jax.random.PRNGKey(0), x32)
    ref = head.apply(vars_, x32)
    out = head.apply(vars_, x32.astype(jnp.bfloat16))
    assert out.dtype == jnp.float32
    # input quantization to bf16 costs ~1e-2 relative; a bf16 196-element
    # mean accumulation would cost ~1e-1 and fail this bound
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_dense_projection_proj_bf16_close_and_f32_pool(monkeypatch):
    """PROJ_BF16 runs the 1x1 convs in bf16 (f32 accumulation) but pools
    and normalizes in f32: results track the f32 path to bf16-rounding
    accuracy and the output dtype stays f32."""
    head = DenseProjectionHead(output_dim=16, spatial_size=(4, 4))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 8))
    vars_ = head.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CONTRASTYOU_PROJ_BF16", "0")
    ref = head.apply(vars_, x.astype(jnp.bfloat16))
    monkeypatch.setenv("CONTRASTYOU_PROJ_BF16", "1")
    out = head.apply(vars_, x.astype(jnp.bfloat16))
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
    # f32 input: the knob must not engage (exact f32 path either way)
    ref32 = head.apply(vars_, x)
    monkeypatch.setenv("CONTRASTYOU_PROJ_BF16", "0")
    np.testing.assert_array_equal(np.asarray(head.apply(vars_, x)),
                                  np.asarray(ref32))


def test_cluster_head_simplex():
    head = ClusterHead(num_clusters=5, num_subheads=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 16))
    vars_ = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(vars_, x)
    assert out.shape == (3, 4, 5)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)
    # subheads must differ (independent init)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_dense_cluster_head_simplex():
    head = DenseClusterHead(num_clusters=6, num_subheads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    vars_ = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(vars_, x)
    assert out.shape == (2, 2, 8, 8, 6)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


def test_discriminator():
    d = Discriminator(input_dim=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 4))
    vars_ = d.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = d.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2,)
    assert ((out >= 0) & (out <= 1)).all()


def test_get_arch_zoo():
    m = get_arch("unet", input_dim=1, num_classes=4, max_channel=128,
                 checkpoint=None)
    assert isinstance(m, UNet)
    with pytest.raises(KeyError):
        get_arch("nope")


def test_l2_normalize_zero_row_gradient_finite():
    """Regression: x/max(norm(x), eps) has a NaN gradient at x == 0, which
    poisoned params one step into superpixel InfoNCE pretraining."""
    from contrastyou_tpu.models.projectors import l2_normalize
    x = jnp.zeros((3, 8)).at[0].set(1.0)  # one live row, two zero rows
    g = jax.grad(lambda a: l2_normalize(a).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
