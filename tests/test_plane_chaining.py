"""Plane-layout stage chaining (round 3): the UNet forward keeps the wide
shallow levels in the Pallas plane layout ACROSS maxpool / skip / 1x1-head
boundaries (models/unet.py chaining plan) — outputs, gradients, and BN
batch-stat updates must be identical to the plain XLA path.

Runs in interpret mode on CPU (CONTRASTYOU_PALLAS_CONV=1), f32, small
spatial sizes — the same code path that compiles for TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.models import UNet
from contrastyou_tpu.ops.pallas import convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


def _mk(max_channel=128, num_classes=4):
    return UNet(input_dim=1, num_classes=num_classes,
                max_channel=max_channel, momentum=0.1, dtype=jnp.float32)


def _init(model, x):
    return model.init(jax.random.PRNGKey(0), x, train=True)


def _fwd(model, v, x, **kw):
    return model.apply(v, x, train=True, mutable=["batch_stats"], **kw)


@pytest.fixture()
def x48():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)


def _assert_trees_close(a, b, rtol=2e-4, atol=2e-4):
    for u, w in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(w),
                                   rtol=rtol, atol=atol)


def test_chained_forward_matches_xla(monkeypatch, x48):
    model = _mk()
    v = _init(model, x48)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    (y0, t0), mut0 = _fwd(model, v, x48)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    (y1, t1), mut1 = _fwd(model, v, x48)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    _assert_trees_close(mut1, mut0)


def test_chained_grads_match_xla(monkeypatch, x48):
    model = _mk()
    v = _init(model, x48)
    tgt = jnp.asarray(np.random.default_rng(1).integers(
        0, 4, (2, 32, 32)), jnp.int32)

    def loss(params, xx):
        (logits, _), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, xx,
            train=True, mutable=["batch_stats"])
        onehot = jax.nn.one_hot(tgt, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    g0 = jax.grad(loss, (0, 1))(v["params"], x48)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    g1 = jax.grad(loss, (0, 1))(v["params"], x48)
    _assert_trees_close(g1, g0, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("taps,until", [
    (("Conv1", "Conv2", "Up_conv2"), None),   # taps force NHWC fallbacks
    (("Conv5",), None),                       # chained levels stay chained
    ((), "Conv2"),                            # truncated forward
    ((), "Up_conv2"),
])
def test_chained_taps_and_until_match_xla(monkeypatch, x48, taps, until):
    model = _mk()
    v = _init(model, x48)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    (y0, t0), _ = _fwd(model, v, x48, taps=taps, until=until)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    (y1, t1), _ = _fwd(model, v, x48, taps=taps, until=until)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    assert set(t1) == set(t0) == set(taps)
    for k in taps:
        assert t1[k].dtype == jnp.float32 and t1[k].ndim == 4
        np.testing.assert_allclose(np.asarray(t1[k]), np.asarray(t0[k]),
                                   rtol=2e-4, atol=2e-4)


def test_chained_bn_groups_match_xla(monkeypatch, x48):
    """Per-group BN statistics (the fused two-stage step) through the
    chained plane path."""
    model = _mk()
    v = _init(model, x48)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    (y0, _), mut0 = _fwd(model, v, x48, bn_groups=(1, 1),
                         bn_update=(True, False))
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    (y1, _), mut1 = _fwd(model, v, x48, bn_groups=(1, 1),
                         bn_update=(True, False))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    _assert_trees_close(mut1, mut0)


def test_plane_maxpool_matches_nhwc_pool():
    import flax.linen as nn
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 8)), jnp.float32)
    g_in = cb.stage_geometry(12, 16, 8, 8, 0, jnp.float32)
    g_out = cb.stage_geometry(6, 8, 8, 16, 0, jnp.float32)
    xp = cb.to_planes(x, jnp.float32, g_in)
    ref = nn.max_pool(x, (2, 2), (2, 2))
    got_planes = cb.plane_maxpool(xp, 12, 16, g_in, g_out)
    np.testing.assert_allclose(
        np.asarray(cb.from_planes(got_planes, 6, 8, g_out)),
        np.asarray(ref), rtol=0, atol=0)
    got_nhwc = cb.plane_maxpool_to_nhwc(xp, 12, 16, g_in)
    np.testing.assert_allclose(np.asarray(got_nhwc), np.asarray(ref),
                               rtol=0, atol=0)
    # borders/guards of the pooled planes must be exactly zero
    m = cb.border_mask(6, 8, g_out)
    np.testing.assert_array_equal(
        np.asarray(got_planes * (1 - m[None])), 0.0)


def test_chained_under_mesh_matches_unsharded(monkeypatch):
    """Full chained UNet forward under a data mesh == unsharded (the plane
    convs carry a custom_partitioning batch rule; the chaining glue is
    plain XLA and must shard along batch for free)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from contrastyou_tpu.parallel import make_mesh

    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 1)), jnp.float32)
    model = _mk()
    v = _init(model, x)
    (y_ref, _), mut_ref = _fwd(model, v, x)

    mesh = make_mesh(8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    vs = jax.tree.map(lambda t: jax.device_put(t, NamedSharding(mesh, P())),
                      v)
    (y_sh, _), mut_sh = jax.jit(
        lambda vv, xx: model.apply(vv, xx, train=True,
                                   mutable=["batch_stats"]))(vs, xs)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    _assert_trees_close(mut_sh, mut_ref)
