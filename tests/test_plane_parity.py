"""Parity-domain widest-level chain (round 3): Conv1 -> maxpool and
Up2 -> Up_conv2 -> Deconv_1x1 run as four quarter-resolution parity planes
(ops/pallas/convblock.py parity section; models/unet.py ``par`` gate) — a
3x3 conv on the interleaved image decomposes exactly into four parity-output
convs over the parity planes, max-pool becomes an elementwise max over the
parity axis, and the only interleave left is the num_classes-wide head.

Outputs, gradients, and BN batch-stat updates must match the interleaved
path. Runs in interpret mode on CPU (CONTRASTYOU_PALLAS_CONV=1), f32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.models import UNet
from contrastyou_tpu.ops.pallas import convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


@pytest.fixture(autouse=True)
def _enable_pallas(monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")


def _mk(max_channel=128, num_classes=4):
    return UNet(input_dim=1, num_classes=num_classes,
                max_channel=max_channel, momentum=0.1, dtype=jnp.float32)


def _fwd(model, v, x, **kw):
    return model.apply(v, x, train=True, mutable=["batch_stats"], **kw)


def _assert_trees_close(a, b, rtol=2e-4, atol=2e-4):
    for u, w in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(w),
                                   rtol=rtol, atol=atol)


@pytest.fixture()
def x32():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)


# ---- op-level ----------------------------------------------------------

@pytest.mark.parametrize("cin", [1, 8])
def test_parity_conv_matches_full_conv(cin):
    rng = np.random.default_rng(1)
    B, Hq, Wq, cout = 2, 8, 10, 16
    geo = cb.pick_geometry(Hq, Wq, max(cin, cout), 4)
    x = jnp.asarray(rng.standard_normal((B, 2 * Hq, 2 * Wq, cin)),
                    jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                     jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xq = cb.parity_split_to_planes(x, jnp.float32, geo)
    mask = cb.border_mask(Hq, Wq, geo)
    out, ssum, ssq = cb.parity_conv3x3_stats(xq, k3, mask, Hq, Wq, geo)
    for q in range(4):
        np.testing.assert_allclose(
            np.asarray(cb.from_planes(out[:, q], Hq, Wq, geo)),
            np.asarray(ref[:, q // 2::2, q % 2::2, :]),
            rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(ref.sum((1, 2))),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ssq),
                               np.asarray((ref * ref).sum((1, 2))),
                               rtol=1e-4, atol=1e-3)


def test_parity_conv_grads_match_full_conv():
    rng = np.random.default_rng(2)
    B, Hq, Wq, cin, cout = 2, 8, 8, 8, 16
    geo = cb.pick_geometry(Hq, Wq, max(cin, cout), 4)
    mask = cb.border_mask(Hq, Wq, geo)
    x = jnp.asarray(rng.standard_normal((B, 2 * Hq, 2 * Wq, cin)),
                    jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                     jnp.float32)

    def loss_ref(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return ((jnp.sin(y) * 0.01).sum() + (y.sum((1, 2)) * 0.003).sum()
                + ((y * y).sum((1, 2)) * 0.001).sum())

    def loss_par(x, k):
        xq = cb.parity_split_to_planes(x, jnp.float32, geo)
        out, s, sq = cb.parity_conv3x3_stats(xq, k, mask, Hq, Wq, geo)
        return ((jnp.sin(out) * mask[None, None] * 0.01).sum()
                + (s * 0.003).sum() + (sq * 0.001).sum())

    g0x, g0k = jax.grad(loss_ref, (0, 1))(x, k3)
    g1x, g1k = jax.grad(loss_par, (0, 1))(x, k3)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g0x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1k), np.asarray(g0k),
                               rtol=1e-4, atol=1e-4)


def test_parity_pool_and_head():
    import flax.linen as nn
    rng = np.random.default_rng(3)
    B, Hq, Wq, C, K = 2, 8, 10, 8, 4
    geo = cb.pick_geometry(Hq, Wq, C, 4)
    x = jnp.asarray(rng.standard_normal((B, 2 * Hq, 2 * Wq, C)), jnp.float32)
    hq = cb.parity_split_to_planes(x, jnp.float32, geo)
    pooled = cb.parity_pool(hq)
    np.testing.assert_array_equal(
        np.asarray(cb.from_planes(pooled, Hq, Wq, geo)),
        np.asarray(nn.max_pool(x, (2, 2), (2, 2))))
    kh = jnp.asarray(rng.standard_normal((C, K)) * 0.1, jnp.float32)
    bh = jnp.asarray(rng.standard_normal((K,)), jnp.float32)
    got = cb.parity_head_to_nhwc(hq, kh, bh, Hq, Wq, geo)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.einsum("bhwc,co->bhwo", x, kh) + bh),
        rtol=1e-5, atol=1e-5)


def test_upconv_plane_parity_matches_upsample_conv():
    rng = np.random.default_rng(4)
    B, Hq, Wq, cin, cout = 2, 8, 8, 16, 8
    geo = cb.pick_geometry(Hq, Wq, max(cin, cout), 4)
    xs = jnp.asarray(rng.standard_normal((B, Hq, Wq, cin)), jnp.float32)
    ku = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                     jnp.float32)
    up = jnp.broadcast_to(xs[:, :, None, :, None, :],
                          (B, Hq, 2, Wq, 2, cin)).reshape(B, 2 * Hq, 2 * Wq,
                                                          cin)
    ref = jax.lax.conv_general_dilated(
        up, ku, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ou, ssum, ssq = cb.upconv_plane_parity(cb.to_planes(xs, jnp.float32, geo),
                                           ku, Hq, Wq, geo)
    for q in range(4):
        np.testing.assert_allclose(
            np.asarray(cb.from_planes(ou[:, q], Hq, Wq, geo)),
            np.asarray(ref[:, q // 2::2, q % 2::2, :]),
            rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(ref.sum((1, 2))),
                               rtol=1e-4, atol=1e-3)


# ---- model-level -------------------------------------------------------

def test_parity_forward_matches_interleaved(monkeypatch, x32):
    model = _mk()
    v = model.init(jax.random.PRNGKey(0), x32, train=True)
    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "0")
    (y0, _), mut0 = _fwd(model, v, x32)
    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "1")
    (y1, _), mut1 = _fwd(model, v, x32)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    _assert_trees_close(mut1, mut0)


def test_parity_grads_match_interleaved(monkeypatch, x32):
    model = _mk()
    v = model.init(jax.random.PRNGKey(0), x32, train=True)
    tgt = jnp.asarray(np.random.default_rng(1).integers(
        0, 4, (2, 32, 32)), jnp.int32)

    def loss(params, xx):
        (logits, _), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, xx,
            train=True, mutable=["batch_stats"])
        onehot = jax.nn.one_hot(tgt, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "0")
    g0 = jax.grad(loss, (0, 1))(v["params"], x32)
    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "1")
    g1 = jax.grad(loss, (0, 1))(v["params"], x32)
    _assert_trees_close(g1, g0, rtol=5e-4, atol=5e-4)


def test_parity_bn_groups_match(monkeypatch, x32):
    model = _mk()
    v = model.init(jax.random.PRNGKey(0), x32, train=True)
    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "0")
    (y0, _), mut0 = _fwd(model, v, x32, bn_groups=(1, 1),
                         bn_update=(True, False))
    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "1")
    (y1, _), mut1 = _fwd(model, v, x32, bn_groups=(1, 1),
                         bn_update=(True, False))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    _assert_trees_close(mut1, mut0)


@pytest.mark.parametrize("taps,until", [
    (("Conv1",), None),            # tap inside the cluster -> fallback
    (("Up_conv2",), None),
    (("Up_conv3",), None),         # Up2 consumes NHWC d3 via to_planes
    ((), "Conv2"),                 # truncated forward through the pool
    (("Deconv_1x1",), None),       # head tap stays parity
])
def test_parity_taps_and_until_match(monkeypatch, x32, taps, until):
    model = _mk()
    v = model.init(jax.random.PRNGKey(0), x32, train=True)
    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "0")
    (y0, t0), _ = _fwd(model, v, x32, taps=taps, until=until)
    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "1")
    (y1, t1), _ = _fwd(model, v, x32, taps=taps, until=until)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    assert set(t1) == set(t0) == set(taps)
    for k in taps:
        assert t1[k].dtype == jnp.float32 and t1[k].ndim == 4
        np.testing.assert_allclose(np.asarray(t1[k]), np.asarray(t0[k]),
                                   rtol=2e-4, atol=2e-4)


def test_parity_under_mesh_matches_unsharded(monkeypatch):
    """Parity chain under a data mesh == unsharded (the blocks kernel rides
    the same custom_partitioning batch rule; parity glue is plain XLA)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from contrastyou_tpu.parallel import make_mesh

    monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", "1")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 1)), jnp.float32)
    model = _mk()
    v = model.init(jax.random.PRNGKey(0), x, train=True)
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


def test_parity_conv_grads_match_with_pallas_dw(monkeypatch):
    """r5: the parity-multi backward can route its weight grad through the
    Pallas dW kernel (PLANE_DW, auto from batch 32 — the einsum form is
    layout-bound at pretrain batch sizes). Grads must match the einsum
    form exactly enough for f32 accumulation order."""
    rng = np.random.default_rng(5)
    B, Hq, Wq, cin, cout = 2, 8, 8, 8, 16
    geo = cb.pick_geometry(Hq, Wq, max(cin, cout), 4)
    mask = cb.border_mask(Hq, Wq, geo)
    x = jnp.asarray(rng.standard_normal((B, 2 * Hq, 2 * Wq, cin)),
                    jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                     jnp.float32)

    def loss_par(x, k):
        xq = cb.parity_split_to_planes(x, jnp.float32, geo)
        out, s, sq = cb.parity_conv3x3_stats(xq, k, mask, Hq, Wq, geo)
        return ((jnp.sin(out) * mask[None, None] * 0.01).sum()
                + (s * 0.003).sum() + (sq * 0.001).sum())

    monkeypatch.setenv("CONTRASTYOU_PLANE_DW", "0")
    g0x, g0k = jax.grad(loss_par, (0, 1))(x, k3)
    monkeypatch.setenv("CONTRASTYOU_PLANE_DW", "1")
    g1x, g1k = jax.grad(loss_par, (0, 1))(x, k3)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g0x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1k), np.asarray(g0k),
                               rtol=1e-4, atol=1e-5)
