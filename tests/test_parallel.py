"""Multi-chip data-parallel tests on the 8-virtual-CPU-device mesh: the FULL
semi-supervised train step jitted over a sharded global batch must (a) run,
(b) produce the same numbers as the unsharded computation (GSPMD inserts the
collectives — global BN stats and global-batch contrastive similarity), and
(c) keep params replicated."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from contrastyou_tpu.engine import ModelBundle, init_train_state
from contrastyou_tpu.engine.optim import create_optimizer
from contrastyou_tpu.engine.steps import build_train_step
from contrastyou_tpu.hooks import ConsistencyTrainerHook, INFONCEHook
from contrastyou_tpu.models import UNet
from contrastyou_tpu.parallel import is_master, make_mesh, replicate, shard_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

B, H = 8, 32


def _setup():
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))
    hooks = [ConsistencyTrainerHook(weight=1.0),
             INFONCEHook(name="nce", feature_name="Conv5", weight=0.5,
                         contrast_on="partition")]
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=1, steps_per_epoch=1)
    state = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                            mode="semi")
    rng = np.random.default_rng(0)
    batch = {
        "labeled_image": jnp.asarray(rng.random((B, H, H, 1), np.float32)),
        "labeled_target": jnp.asarray(rng.integers(0, 4, (B, H, H)), jnp.int32),
        "unlabeled_image": jnp.asarray(rng.random((B, H, H, 1), np.float32)),
        "unlabeled_partition": jnp.asarray(rng.integers(0, 3, (B,)), jnp.int32),
        "unlabeled_scan_id": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
        "unlabeled_patient": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
        "unlabeled_cycle": jnp.zeros((B,), jnp.int32),
    }
    return state, step, batch


def test_sharded_step_matches_single_device():
    state, step, batch = _setup()
    key = jax.random.PRNGKey(5)
    state_copy = jax.tree.map(jnp.array, state)  # step donates its input
    # single-device reference
    state_ref, metrics_ref = step(state, batch, key, jnp.int32(0))
    state = state_copy

    mesh = make_mesh(8)
    sharded_batch = shard_batch(batch, mesh)
    state_rep = replicate(state, mesh)
    state_dp, metrics_dp = step(state_rep, sharded_batch, key, jnp.int32(0))

    # same total loss (fp reassociation tolerance) -> BN stats and the 2Nx2N
    # contrastive matrix were computed over the GLOBAL batch
    assert float(metrics_dp["total_loss"]) == pytest.approx(
        float(metrics_ref["total_loss"]), rel=2e-3)
    assert float(metrics_dp["nce/loss"]) == pytest.approx(
        float(metrics_ref["nce/loss"]), rel=2e-3)
    # params identical after one update
    a = np.asarray(jax.tree.leaves(state_ref.params)[0])
    b = np.asarray(jax.tree.leaves(state_dp.params)[0])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_batch_sharding_layout():
    mesh = make_mesh(8)
    batch = {"x": np.zeros((8, 4, 4, 1), np.float32)}
    sharded = shard_batch(batch, mesh)
    sharding = sharded["x"].sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec == P("data", None, None, None)
    # each device holds 1/8 of the batch
    assert sharded["x"].addressable_shards[0].data.shape == (1, 4, 4, 1)


def test_is_master():
    assert is_master() is True  # single process
