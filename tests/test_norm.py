"""MXUBatchNorm == flax BatchNorm (fwd values, grads, running stats) — the
env-gated MXU-reduction BN used for TPU perf (models/norm.py)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.models.norm import MXUBatchNorm


@pytest.mark.parametrize("shape", [(10, 16, 16, 32), (4, 7, 5, 3)])
def test_train_forward_matches_flax(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3 + 1
    ours = MXUBatchNorm(use_running_average=False, momentum=0.9,
                        dtype=jnp.float32)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       dtype=jnp.float32)
    v0 = ours.init(jax.random.PRNGKey(1), x)
    vr = ref.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(v0) == jax.tree.structure(vr)
    # non-trivial affine
    v0 = jax.tree.map(lambda a: a, v0)
    scale = jnp.linspace(0.5, 2.0, shape[-1])
    bias = jnp.linspace(-1.0, 1.0, shape[-1])
    params = {"scale": scale, "bias": bias}
    y0, m0 = ours.apply({"params": params, "batch_stats": v0["batch_stats"]},
                        x, mutable=["batch_stats"])
    y1, m1 = ref.apply({"params": params, "batch_stats": vr["batch_stats"]},
                       x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m0["batch_stats"][k]),
            np.asarray(m1["batch_stats"][k]), rtol=2e-5, atol=2e-5)


def test_grads_match_flax():
    shape = (6, 8, 8, 16)
    x = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
    scale = jnp.linspace(0.5, 2.0, shape[-1])
    bias = jnp.linspace(-1.0, 1.0, shape[-1])
    tgt = jax.random.normal(jax.random.PRNGKey(3), shape, jnp.float32)

    def loss(mod, p, xx):
        stats = {"mean": jnp.zeros(shape[-1]), "var": jnp.ones(shape[-1])}
        y, _ = mod.apply({"params": p, "batch_stats": stats}, xx,
                         mutable=["batch_stats"])
        return jnp.mean((y - tgt) ** 2)

    ours = MXUBatchNorm(use_running_average=False, dtype=jnp.float32)
    ref = nn.BatchNorm(use_running_average=False, dtype=jnp.float32)
    p = {"scale": scale, "bias": bias}
    g0 = jax.grad(loss, argnums=(1, 2))(ours, p, x)
    g1 = jax.grad(loss, argnums=(1, 2))(ref, p, x)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_eval_uses_running_stats():
    shape = (4, 8, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    stats = {"mean": jnp.full((8,), 0.5), "var": jnp.full((8,), 4.0)}
    p = {"scale": jnp.ones(8), "bias": jnp.zeros(8)}
    ours = MXUBatchNorm(use_running_average=True, dtype=jnp.float32)
    ref = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)
    y0 = ours.apply({"params": p, "batch_stats": stats}, x)
    y1 = ref.apply({"params": p, "batch_stats": stats}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-6, atol=2e-6)


def test_unet_gate_swaps_implementation(monkeypatch):
    from contrastyou_tpu.models import UNet
    x = jnp.ones((2, 32, 32, 1))
    monkeypatch.setenv("CONTRASTYOU_MXU_BN", "1")
    m = UNet(input_dim=1, num_classes=4, max_channel=128, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    monkeypatch.setenv("CONTRASTYOU_MXU_BN", "0")
    m2 = UNet(input_dim=1, num_classes=4, max_channel=128, dtype=jnp.float32)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    # identical variable trees either way (checkpoint compatibility)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    y1, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    y2, _ = m2.apply(v2, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y2[0]),
                               rtol=5e-4, atol=5e-4)


def test_fused_upconv_equals_upsample_then_conv():
    from contrastyou_tpu.models.unet import (conv3x3_on_upsampled,
                                             upsample2x_nearest)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 9, 11, 5), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(8), (3, 3, 5, 6), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        upsample2x_nearest(x), k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = conv3x3_on_upsampled(x, k)
    assert out.shape == ref.shape == (2, 18, 22, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
