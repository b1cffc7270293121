"""Eval-mode plane/parity routing (round 3): ``train=False`` forwards
(teacher passes, eval/inference epochs) route through the same Pallas plane
stages as the train step, with BN folded to a per-channel affine from the
RUNNING statistics (``eval_affine`` in ops/pallas/convblock.py) — outputs
must match the plain-XLA inference path (ref nn.BatchNorm
use_running_average semantics; reference eval loop epocher.py:143-157).

The parity-domain widest-level chain is DEFAULT-ON for these forward-only
applications (``use_parity_chain(fwd_only=True)``) — it wins forward-only
and only loses when a backward pays the quarter-geometry padding.

Runs in interpret mode on CPU (CONTRASTYOU_PALLAS_CONV=1), like the other
plane suites.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.models import UNet

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


def _mk(max_channel=128, num_classes=4):
    return UNet(input_dim=1, num_classes=num_classes,
                max_channel=max_channel, momentum=0.1, dtype=jnp.float32)


@pytest.fixture()
def x32():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)


def _vars_with_live_stats(model, x):
    """init, then make the running stats non-trivial so the eval affine is
    actually exercised (fresh init has mean=0/var=1 everywhere)."""
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    (_, _), mut = model.apply(v, x * 1.7 + 0.3, train=True,
                              mutable=["batch_stats"])
    return {"params": v["params"], "batch_stats": mut["batch_stats"]}


def _eval_fwd(model, v, x, **kw):
    return model.apply(v, x, train=False, **kw)


@pytest.mark.parametrize("parity", ["0", None])
def test_eval_forward_matches_xla(monkeypatch, x32, parity):
    """plane-eval (parity='0') and parity-eval (default for fwd-only)
    both reproduce the XLA inference forward."""
    model = _mk()
    v = _vars_with_live_stats(model, x32)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    y0, _ = _eval_fwd(model, v, x32)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    if parity is None:
        monkeypatch.delenv("CONTRASTYOU_PLANE_PARITY", raising=False)
    else:
        monkeypatch.setenv("CONTRASTYOU_PLANE_PARITY", parity)
    y1, _ = _eval_fwd(model, v, x32)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)


def test_eval_taps_until_fallback(monkeypatch, x32):
    """taps/until on chained layers statically fall back to NHWC at eval,
    exactly like the train-side chaining plan."""
    model = _mk()
    v = _vars_with_live_stats(model, x32)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    y0, t0 = _eval_fwd(model, v, x32, taps=("Conv1", "Conv2", "Up_conv2"))
    u0, _ = _eval_fwd(model, v, x32, until="Up_conv2")
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    y1, t1 = _eval_fwd(model, v, x32, taps=("Conv1", "Conv2", "Up_conv2"))
    u1, _ = _eval_fwd(model, v, x32, until="Up_conv2")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    for k in t0:
        np.testing.assert_allclose(np.asarray(t1[k]), np.asarray(t0[k]),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=2e-4, atol=2e-4)


def test_eval_does_not_mutate_stats(monkeypatch, x32):
    """apply without mutable collections must stay side-effect free on the
    kernel path (the eval branch never writes running stats)."""
    model = _mk()
    v = _vars_with_live_stats(model, x32)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    before = jax.tree.map(np.asarray, v["batch_stats"])
    _eval_fwd(model, v, x32)
    after = jax.tree.map(np.asarray, v["batch_stats"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_eval_under_mesh_matches_unsharded(monkeypatch, x32):
    """the eval kernels ride the same custom_partitioning batch rule as the
    train stage — batch-sharded eval == unsharded eval."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices()[:2])
    if devs.size < 2:
        pytest.skip("needs >=2 devices")
    model = _mk()
    v = _vars_with_live_stats(model, x32)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    y0, _ = _eval_fwd(model, v, x32)
    mesh = Mesh(devs, ("data",))
    xs = jax.device_put(x32, NamedSharding(mesh, P("data")))
    with mesh:
        y1, _ = jax.jit(lambda xx: model.apply(v, xx, train=False))(xs)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)


def test_fwd_only_hint_matches_train_forward(monkeypatch, x32):
    """fwd_only=True (teacher passes: train-mode BN, never differentiated)
    routes the parity chain but must reproduce the train forward AND its
    batch-stat updates exactly."""
    model = _mk()
    v = _vars_with_live_stats(model, x32)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    monkeypatch.delenv("CONTRASTYOU_PLANE_PARITY", raising=False)
    (y0, _), mut0 = model.apply(v, x32, train=True, mutable=["batch_stats"])
    (y1, _), mut1 = model.apply(v, x32, train=True, fwd_only=True,
                                mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_scanned_eval_sharded_matches_unsharded(monkeypatch):
    """mesh-native eval (trainer.eval_epoch shards the [K, B, ...] chunk's
    batch axis): sharded scanned-eval counts == unsharded, through the
    Pallas eval routing."""
    from contrastyou_tpu.engine.bundle import ModelBundle
    from contrastyou_tpu.engine.steps import build_scanned_eval_step
    from contrastyou_tpu.parallel import make_mesh, shard_batch
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    model = _mk()
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (32, 32, 1))
    ev = build_scanned_eval_step(bundle)
    rng = np.random.default_rng(3)
    K, B = 2, 4
    imgs = jnp.asarray(rng.standard_normal((K, B, 32, 32, 1)), jnp.float32)
    tgts = jnp.asarray(rng.integers(0, 4, (K, B, 32, 32)), jnp.int32)
    msks = jnp.ones((K, B), bool)
    l0, i0, u0 = ev(bundle.params, bundle.batch_stats, imgs, tgts, msks)
    mesh = make_mesh(2)
    sh = shard_batch({"i": imgs, "t": tgts, "m": msks}, mesh, batch_dim=1)
    with mesh:
        l1, i1, u1 = ev(bundle.params, bundle.batch_stats,
                        sh["i"], sh["t"], sh["m"])
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u0))


def test_teacher_eval_apply_matches(monkeypatch, x32):
    """ModelBundle.apply_eval (the MT teacher-eval / eval-step entry) picks
    up the kernel routing transparently."""
    from contrastyou_tpu.engine.bundle import ModelBundle
    model = _mk()
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (32, 32, 1))
    v = _vars_with_live_stats(model, x32)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "0")
    y0, _ = bundle.apply_eval(v["params"], v["batch_stats"], x32)
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    y1, _ = bundle.apply_eval(v["params"], v["batch_stats"], x32)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
