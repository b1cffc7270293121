"""Hook-level tests: run the compiled step with the full hook stack on a tiny
model and verify each hook contributes a finite loss, states update (EMA
teacher), and gradients flow to hook params."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.engine import ModelBundle, init_train_state
from contrastyou_tpu.engine.optim import create_optimizer
from contrastyou_tpu.engine.steps import build_train_step
from contrastyou_tpu.hooks import (ConsistencyTrainerHook,
                                   DenoisingAutoEncoderTrainerHook,
                                   DiscreteIMSATTrainHook, DiscreteMITrainHook,
                                   EntropyMinTrainerHook,
                                   ICTMeanTeacherTrainerHook,
                                   IIDSegmentationTrainerHook, IMSATTrainHook,
                                   INFONCEHook, MeanTeacherTrainerHook,
                                   MixUpTrainHook, OrthogonalTrainerHook,
                                   PseudoLabelTrainerHook,
                                   SelfPacedINFONCEHook, SuperPixelInfoNCEHook,
                                   UAMeanTeacherTrainerHook)
from contrastyou_tpu.models import UNet

B, H = 4, 32


def _bundle():
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    return ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))


def _batch(with_superpixel=False):
    rng = np.random.default_rng(0)
    batch = {
        "labeled_image": jnp.asarray(rng.random((B, H, H, 1), np.float32)),
        "labeled_target": jnp.asarray(rng.integers(0, 4, (B, H, H)), jnp.int32),
        "unlabeled_image": jnp.asarray(rng.random((B, H, H, 1), np.float32)),
        "unlabeled_partition": jnp.asarray([0, 1, 2, 0], jnp.int32),
        "unlabeled_scan_id": jnp.asarray([0, 0, 1, 1], jnp.int32),
        "unlabeled_patient": jnp.asarray([0, 0, 1, 1], jnp.int32),
        "unlabeled_cycle": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    if with_superpixel:
        batch["unlabeled_superpixel"] = jnp.asarray(
            rng.integers(0, 10, (B, H, H)), jnp.int32)
    return batch


ALL_HOOKS = [
    ConsistencyTrainerHook(name="consistency", weight=0.5),
    EntropyMinTrainerHook(name="entmin", weight=0.01),
    PseudoLabelTrainerHook(name="pl", weight=0.01),
    MeanTeacherTrainerHook(name="mt", weight=1.0),
    UAMeanTeacherTrainerHook(name="uamt", weight=1.0, num_noise=2,
                             max_epoch=10),
    ICTMeanTeacherTrainerHook(name="ict", weight=1.0),
    MixUpTrainHook(hook_name="mixup", weight=0.1),
    OrthogonalTrainerHook(hook_name="orth", weight=0.1),
    DenoisingAutoEncoderTrainerHook(hook_name="dae", weight=0.1),
    IIDSegmentationTrainerHook(hook_name="midl", weight=0.1),
    IMSATTrainHook(hook_name="imsat", weight=0.1),
    DiscreteMITrainHook(name="dmi_enc", feature_name="Conv5", weight=0.1,
                        num_clusters=6, num_subheads=2),
    DiscreteMITrainHook(name="dmi_dec", feature_name="Up_conv3", weight=0.1,
                        num_clusters=6, num_subheads=2, padding=1),
    DiscreteIMSATTrainHook(name="dimsat", feature_name="Conv5", weight=0.1,
                           num_clusters=6, num_subheads=2, cons_weight=0.1),
    INFONCEHook(name="nce_enc", feature_name="Conv5", weight=0.1,
                contrast_on="partition"),
    INFONCEHook(name="nce_dense", feature_name="Up_conv2", weight=0.1,
                spatial_size=(8, 8), contrast_on="self"),
    SelfPacedINFONCEHook(name="spnce", feature_name="Conv5", weight=0.1,
                         contrast_on="patient", begin_value=4.0,
                         end_value=10.0, max_epoch=10),
    SuperPixelInfoNCEHook(name="spx", feature_name="Up_conv2", weight=0.1,
                          spatial_size=(8, 8)),
]


@pytest.fixture(scope="module")
def stepped():
    bundle = _bundle()
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=2, steps_per_epoch=2)
    state = init_train_state(bundle, ALL_HOOKS, optimizer,
                             jax.random.PRNGKey(1))
    step = build_train_step(bundle, optimizer, ALL_HOOKS, two_stage=True,
                            mode="semi")
    batch = _batch(with_superpixel=True)
    # the step donates its input state; snapshot pre-step values for the tests
    state0 = jax.tree.map(jnp.array, state)
    state1, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.int32(0))
    state1_snap = jax.tree.map(jnp.array, state1)
    state2, metrics2 = step(state1, batch, jax.random.PRNGKey(3), jnp.int32(1))
    return state0, state1_snap, state2, metrics, metrics2


def test_all_hook_losses_finite(stepped):
    _, _, _, metrics, _ = stepped
    for hook in ALL_HOOKS:
        val = float(metrics[f"{hook.name}/loss"])
        assert np.isfinite(val), (hook.name, val)


def test_total_loss_finite_and_params_move(stepped):
    state0, state1, _, metrics, _ = stepped
    assert np.isfinite(float(metrics["total_loss"]))
    a = jax.tree.leaves(state0.params)[0]
    b = jax.tree.leaves(state1.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_teacher_ema_updates(stepped):
    state0, state1, state2, _, _ = stepped
    t0 = jax.tree.leaves(state0.hook_states["mt"]["teacher_params"])[0]
    t2 = jax.tree.leaves(state2.hook_states["mt"]["teacher_params"])[0]
    assert not np.allclose(np.asarray(t0), np.asarray(t2))
    assert int(state2.hook_states["mt"]["ema_step"]) == 2


def test_teacher_tracks_student_slowly(stepped):
    state0, state1, _, _, _ = stepped
    s1 = np.asarray(jax.tree.leaves(state1.params)[0])
    t1 = np.asarray(jax.tree.leaves(state1.hook_states["mt"]["teacher_params"])[0])
    t0 = np.asarray(jax.tree.leaves(state0.hook_states["mt"]["teacher_params"])[0])
    # justified alpha at step 0 = 0, so teacher_1 == student_1 * (1-wd)
    np.testing.assert_allclose(t1, s1 * (1 - 1e-5), rtol=1e-5)


def test_hook_params_get_gradients(stepped):
    state0, state1, _, _, _ = stepped
    p0 = jax.tree.leaves(state0.hook_params["nce_enc"])[0]
    p1 = jax.tree.leaves(state1.hook_params["nce_enc"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_self_paced_metrics(stepped):
    _, _, _, metrics, metrics2 = stepped
    g0 = float(metrics["spnce/age_param"])
    g1 = float(metrics2["spnce/age_param"])
    assert g0 == pytest.approx(4.0)  # epoch 0 -> begin_value
    assert g1 > g0                   # gamma ramps with epoch
    assert 0.0 <= float(metrics["spnce/sp_weight"]) <= 1.0


def test_uamt_mask_metric(stepped):
    _, _, _, metrics, _ = stepped
    assert 0.0 <= float(metrics["uamt/mask"]) <= 1.0


@pytest.mark.pallas
def test_uamt_runs_through_pallas_stage(monkeypatch):
    """Round-3 regression: the UAMT noisy teacher passes must NOT vmap the
    model — the Pallas plane stage is mesh-safe via custom_partitioning,
    which has no vmap batching rule (the vmapped form raised
    NotImplementedError on TPU). The N passes now run as one stacked
    forward with per-pass batch statistics (bn_groups=(B,)*N)."""
    monkeypatch.setenv("CONTRASTYOU_PALLAS_CONV", "1")
    bundle = _bundle()
    hooks = [UAMeanTeacherTrainerHook(name="uamt", weight=1.0, num_noise=2,
                                      max_epoch=2)]
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=2, steps_per_epoch=2)
    state = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                            mode="semi")
    state, metrics = step(state, _batch(), jax.random.PRNGKey(2),
                          jnp.int32(0))
    assert np.isfinite(float(metrics["uamt/loss"]))
    assert np.isfinite(float(metrics["total_loss"]))


def test_uamt_fallback_matches_bn_groups(monkeypatch):
    """ADVICE r3: the fallback for models without supports_bn_groups must
    preserve per-pass BN statistics (loop of N forwards over B), matching
    the bn_groups fast path — not one pooled [N*B] forward."""
    bundle = _bundle()
    hooks = [UAMeanTeacherTrainerHook(name="uamt", weight=1.0, num_noise=2,
                                      max_epoch=2)]
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=2, steps_per_epoch=2)
    batch = _batch()

    def run():
        state = init_train_state(bundle, hooks, optimizer,
                                 jax.random.PRNGKey(1))
        step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                                mode="semi")
        _, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.int32(0))
        return float(metrics["uamt/loss"])

    fast = run()
    monkeypatch.setattr(type(bundle.model), "supports_bn_groups", False)
    slow = run()
    assert np.isfinite(fast)
    np.testing.assert_allclose(slow, fast, rtol=2e-5, atol=2e-6)


def test_dense_nce_bf16_warp_matches_f32(monkeypatch):
    """Round-3: dense InfoNCE warps the feature tap in bf16 (lossless —
    taps are exact upcasts of bf16 activations and the nearest warp is
    pure selection); the loss must match the f32-warp arm."""
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.bfloat16)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))
    hooks = [INFONCEHook(name="nce_dense", feature_name="Up_conv2",
                         weight=1.0, contrast_on="self",
                         spatial_size=(8, 8))]
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=2, steps_per_epoch=2)
    batch = _batch()

    def run():
        state = init_train_state(bundle, hooks, optimizer,
                                 jax.random.PRNGKey(1))
        step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                                mode="semi")
        _, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.int32(0))
        return float(metrics["nce_dense/loss"])

    monkeypatch.setenv("CONTRASTYOU_NCE_BF16", "0")
    l0 = run()
    monkeypatch.setenv("CONTRASTYOU_NCE_BF16", "1")
    l1 = run()
    assert np.isfinite(l0) and np.isfinite(l1)
    np.testing.assert_allclose(l1, l0, rtol=2e-3)
