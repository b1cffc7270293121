"""Pallas plane-conv stage (ops/pallas/convblock.py) == XLA ConvBlock path:
forward, gradients, batch-stat updates. Runs in interpret mode on CPU (the
same kernels compile for TPU; tools/scripts_perf_convblock.py is the on-chip A/B).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.models.unet import ConvBlock
from contrastyou_tpu.ops.pallas import convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


def _mkblock():
    return ConvBlock(features=16, momentum=0.1, dtype=jnp.float32)


def _init(block, x, skip=None):
    kw = {} if skip is None else {"skip": skip}
    return block.init(jax.random.PRNGKey(0), x, train=True, **kw)


@pytest.mark.parametrize("with_skip", [False, True])
def test_stage_matches_xla_path(monkeypatch, with_skip):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 20, 24, 8)), jnp.float32)
    skip = (jnp.asarray(rng.standard_normal((2, 20, 24, 4)), jnp.float32)
            if with_skip else None)
    block = _mkblock()
    v = _init(block, x, skip)
    kw = {} if skip is None else {"skip": skip}

    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    y_ref, mut_ref = block.apply(v, x, train=True, mutable=["batch_stats"],
                                 **kw)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    y_pal, mut_pal = block.apply(v, x, train=True, mutable=["batch_stats"],
                                 **kw)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(mut_pal), jax.tree.leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_stage_grads_match_xla_path(monkeypatch):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 12, 14, 8)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 12, 14, 16)), jnp.float32)
    block = _mkblock()
    v = _init(block, x)

    def loss(params, xx):
        y, _ = block.apply({"params": params,
                            "batch_stats": v["batch_stats"]}, xx,
                           train=True, mutable=["batch_stats"])
        return jnp.mean((y - tgt) ** 2)

    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    g_ref = jax.grad(loss, (0, 1))(v["params"], x)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    g_pal = jax.grad(loss, (0, 1))(v["params"], x)
    for a, b in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_skip_path_grads_and_stats_match_xla(monkeypatch):
    """The two-slice-conv skip form (the only VMEM-feasible layout — see the
    round-3 negative result in convblock_stage) must match the XLA ConvBlock
    path in forward, batch-stat updates, and grads wrt params/x/skip."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 12, 14, 8)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, 12, 14, 8)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 12, 14, 16)), jnp.float32)
    block = _mkblock()
    v = _init(block, x, skip)

    def loss(params, xx, ss):
        y, mut = block.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, xx,
                             skip=ss, train=True, mutable=["batch_stats"])
        return jnp.mean((y - tgt) ** 2), (y, mut)

    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    g_ref, (y_ref, mut_ref) = jax.grad(loss, (0, 1, 2), has_aux=True)(
        v["params"], x, skip)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    g_pal, (y_pal, mut_pal) = jax.grad(loss, (0, 1, 2), has_aux=True)(
        v["params"], x, skip)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves((g_pal, mut_pal)),
                    jax.tree.leaves((g_ref, mut_ref))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_eval_path_matches_xla(monkeypatch):
    # round 3: eval ROUTES THROUGH the kernels when gated (eval_affine from
    # running stats) and must match the XLA running-stat path within kernel
    # accumulation tolerance (full-model coverage: tests/test_eval_plane.py)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 8)), jnp.float32)
    block = _mkblock()
    v = _init(block, x)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    y1 = block.apply(v, x, train=False)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    y0 = block.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)


def test_plane_roundtrip_and_mask():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 9, 13, 5)), jnp.float32)
    xp = cb.to_planes(x, jnp.float32)
    np.testing.assert_allclose(np.asarray(cb.from_planes(xp, 9, 13)),
                               np.asarray(x))
    m = cb.border_mask(9, 13)
    assert float(m.sum()) == 9 * 13


def test_stage_under_mesh_matches_unsharded(monkeypatch):
    """The plane convs carry a custom_partitioning batch rule — a ConvBlock
    forward over a sharded batch must equal the unsharded one (the BN stat
    sums become the global cross-shard reduction)."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from contrastyou_tpu.parallel import make_mesh

    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 12, 14, 8)), jnp.float32)
    block = _mkblock()
    v = _init(block, x)
    y_ref, mut_ref = block.apply(v, x, train=True, mutable=["batch_stats"])

    mesh = make_mesh(8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    vs = jax.tree.map(
        lambda t: jax.device_put(t, NamedSharding(mesh, P())), v)
    y_sh, mut_sh = jax.jit(
        lambda vv, xx: block.apply(vv, xx, train=True,
                                   mutable=["batch_stats"]))(vs, xs)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    for a2, b2 in zip(jax.tree.leaves(mut_sh), jax.tree.leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                                   rtol=2e-4, atol=2e-4)
