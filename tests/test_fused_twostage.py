"""Fused two-stage (one batch-(nl+2*nu) conv pass with per-group BN stats)
== the sequential two-pass step, for both disable_bn settings and through
the Pallas plane stage (round-3 MFU work; see engine/steps.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.engine import ModelBundle, init_train_state
from contrastyou_tpu.engine.optim import create_optimizer
from contrastyou_tpu.engine.steps import build_train_step
from contrastyou_tpu.hooks import ConsistencyTrainerHook, MeanTeacherTrainerHook
from contrastyou_tpu.models import UNet

NL, NU, H = 3, 5, 32


def _batch(rng):
    return {
        "labeled_image": jnp.asarray(rng.random((NL, H, H, 1), np.float32)),
        "labeled_target": jnp.asarray(rng.integers(0, 4, (NL, H, H)),
                                      jnp.int32),
        "unlabeled_image": jnp.asarray(rng.random((NU, H, H, 1), np.float32)),
        "unlabeled_partition": jnp.zeros((NU,), jnp.int32),
        "unlabeled_scan_id": jnp.zeros((NU,), jnp.int32),
        "unlabeled_patient": jnp.zeros((NU,), jnp.int32),
        "unlabeled_cycle": jnp.zeros((NU,), jnp.int32),
    }


@pytest.mark.parametrize("disable_bn", [False, True])
@pytest.mark.parametrize("pallas", [
    "0",
    # the pallas="1" combos run the plane kernels in interpret mode —
    # ~5 min of the quick lane on this 1-core host; they live in the
    # pallas lane with the other interpret-mode kernel suites (r5)
    pytest.param("1", marks=pytest.mark.pallas),
])
def test_fused_matches_sequential(monkeypatch, disable_bn, pallas):
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", pallas)
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))
    hooks = [ConsistencyTrainerHook(weight=1.0),
             MeanTeacherTrainerHook(weight=0.5, alpha=0.9)]
    optimizer, _ = create_optimizer({"name": "sgd", "lr": 1e-2}, None,
                                    max_epoch=1, steps_per_epoch=1)
    batch = _batch(np.random.default_rng(0))
    key = jax.random.PRNGKey(3)

    def run(fused: str):
        monkeypatch.setenv("CONTRASTYOU_FUSED_TWOSTAGE", fused)
        state = init_train_state(bundle, hooks, optimizer,
                                 jax.random.PRNGKey(1))
        step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                                mode="semi", disable_bn=disable_bn)
        return step(state, batch, key, jnp.int32(0))

    state_seq, m_seq = run("0")
    state_fus, m_fus = run("1")
    assert float(m_fus["total_loss"]) == pytest.approx(
        float(m_seq["total_loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(state_seq.params),
                    jax.tree.leaves(state_fus.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=2e-5)
    # running statistics: labeled-then-unlabeled EMA order must be preserved
    for a, b in zip(jax.tree.leaves(state_seq.batch_stats),
                    jax.tree.leaves(state_fus.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
