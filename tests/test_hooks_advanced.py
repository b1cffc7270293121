"""Advanced hooks: cross-correlation block, DMT methods, hook creator, and
pretrain step/trainer end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.engine import ModelBundle, init_train_state
from contrastyou_tpu.engine.optim import create_optimizer
from contrastyou_tpu.engine.steps import build_train_step
from contrastyou_tpu.hooks import (CrossCorrelationHook,
                                   DifferentiableMeanTeacherTrainerHook,
                                   create_hook_from_config)
from contrastyou_tpu.hooks.infonce import INFONCEHook
from contrastyou_tpu.models import UNet
from contrastyou_tpu.trainers.pretrain import (build_pretrain_step,
                                               feature_until_from_hooks)

B, H = 4, 32


def _bundle():
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    return ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))


def _batch():
    rng = np.random.default_rng(0)
    return {
        "labeled_image": jnp.asarray(rng.random((B, H, H, 1), np.float32)),
        "labeled_target": jnp.asarray(rng.integers(0, 4, (B, H, H)), jnp.int32),
        "unlabeled_image": jnp.asarray(rng.random((B, H, H, 1), np.float32)),
        "unlabeled_partition": jnp.asarray([0, 1, 2, 0], jnp.int32),
        "unlabeled_scan_id": jnp.asarray([0, 0, 1, 1], jnp.int32),
        "unlabeled_patient": jnp.asarray([0, 0, 1, 1], jnp.int32),
        "unlabeled_cycle": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }


def _run_steps(hooks, n=2):
    bundle = _bundle()
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=2, steps_per_epoch=2)
    state = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                            mode="semi")
    batch = _batch()
    all_metrics = []
    for i in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i),
                              jnp.int32(i))
        all_metrics.append(metrics)
    return state, all_metrics


def test_ccblock_full_stack():
    hook = CrossCorrelationHook(
        name="cc_Up_conv2", feature_name="Up_conv2", num_clusters=8,
        num_subheads=2,
        hooks={"cc": {"weight": 0.1, "kernel_size": 5, "diff_power": 0.75},
               "rr": {"weight": 1.0, "symmetric": True, "lamda": 1.5,
                      "alpha": 0.5},
               "mi": {"weight": 0.5, "lamda": 1.0, "padding": 1},
               "imsat": {"weight": 0.1, "use_dynamic": True},
               "consist": {"weight": 0.1}})
    state, metrics = _run_steps([hook])
    m = metrics[0]
    for key in ("cc_Up_conv2/cc", "cc_Up_conv2/rr", "cc_Up_conv2/mi",
                "cc_Up_conv2/imsat", "cc_Up_conv2/consist"):
        assert np.isfinite(float(m[key])), key
    # dynamic IMSAT weight updated in state
    w0 = 1.0
    w2 = float(state.hook_states["cc_Up_conv2"]["imsat_weight"])
    assert w2 != w0


def test_ccblock_on_logits():
    hook = CrossCorrelationHook(
        name="cc_Deconv_1x1", feature_name="Deconv_1x1",
        hooks={"cc": {"weight": 0.1, "kernel_size": 5},
               "mi": {"weight": 0.5, "lamda": 1.0, "padding": 0}})
    _, metrics = _run_steps([hook], n=1)
    assert np.isfinite(float(metrics[0]["cc_Deconv_1x1/cc"]))


@pytest.mark.parametrize("method", ["mt", "method1", "method2", "method3",
                                    "method4", "second_order"])
def test_dmt_methods(method):
    hook = DifferentiableMeanTeacherTrainerHook(
        name="dmt", weight=1.0, meta_weight=1e-3, meta_criterion="ce",
        method_name=method)
    state, metrics = _run_steps([hook], n=2)
    assert np.isfinite(float(metrics[0]["dmt/consistency_loss"]))
    t0 = _bundle().params
    t2 = state.hook_states["dmt"]["teacher_params"]
    a = np.asarray(jax.tree.leaves(t0)[0])
    b = np.asarray(jax.tree.leaves(t2)[0])
    assert not np.allclose(a, b)  # teacher moved


def test_dmt_second_order_student_meta_gradient():
    """The second_order method must push a NONZERO second-order meta gradient
    into the STUDENT: grad of the hook loss wrt student params differs from
    the plain-mt hook's (whose consistency target is stop-gradded), and the
    meta term itself has nonzero student grad (ref epocher.py:466-487)."""
    from contrastyou_tpu.engine.hooks import StepContext

    bundle = _bundle()
    rng = np.random.default_rng(3)
    labeled_image = jnp.asarray(rng.random((B, H, H, 1), np.float32))
    labeled_target = jnp.asarray(rng.integers(0, 4, (B, H, H)), jnp.int32)
    unlabeled_image = jnp.asarray(rng.random((B, H, H, 1), np.float32))

    hook = DifferentiableMeanTeacherTrainerHook(
        name="dmt", weight=1.0, meta_weight=1e-2, meta_criterion="ce",
        method_name="second_order")
    _, hstate = hook.init(jax.random.PRNGKey(2), bundle)
    # teacher must differ from the student for a nonzero meta signal
    hstate["teacher_params"] = jax.tree.map(
        lambda p: p + 0.01 * jnp.ones_like(p), hstate["teacher_params"])

    def hook_loss(params):
        ctx = StepContext(bundle=bundle, params=params,
                          rng=jax.random.PRNGKey(0), epoch=jnp.int32(0))
        ctx.labeled_image = labeled_image
        ctx.labeled_target = labeled_target
        ctx.unlabeled_image = unlabeled_image
        ctx.unlabeled_image_tf = unlabeled_image
        (logits, _), stats = bundle.apply_train(params, bundle.batch_stats,
                                                labeled_image)
        ctx.labeled_logits = logits
        ctx.batch_stats = stats
        (u_logits, _), _ = bundle.apply_train(params, stats, unlabeled_image)
        ctx.unlabeled_tf_logits = u_logits
        ctx.geo_params = None
        ctx.affine_transformer = lambda x, **kw: x  # identity geometry
        loss, _, metrics = hook.loss(ctx, {}, hstate)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(hook_loss, has_aux=True)(
        bundle.params)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["meta_loss"]))

    # differentiate the META TERM ALONE: its only path to the student is
    # through the inner jax.grad (the virtual update) — nonzero proves the
    # second-order signal reaches the student
    meta_grads = jax.grad(lambda p: hook_loss(p)[1]["meta_loss"])(
        bundle.params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(meta_grads))
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_dmt_second_order_short_run_stable():
    hook = DifferentiableMeanTeacherTrainerHook(
        name="dmt", weight=0.1, meta_weight=1e-3, meta_criterion="ce",
        method_name="second_order")
    state, metrics = _run_steps([hook], n=2)
    for m in metrics:
        assert np.isfinite(float(m["dmt/consistency_loss"]))
        assert np.isfinite(float(m["dmt/meta_loss"]))
        assert np.isfinite(float(m["total_loss"]))


def test_dmt_dice_meta():
    hook = DifferentiableMeanTeacherTrainerHook(
        name="dmt", meta_criterion="dice", method_name="method3")
    _, metrics = _run_steps([hook], n=1)
    assert np.isfinite(float(metrics[0]["dmt/consistency_loss"]))


def test_hook_creator_reference_config_keys():
    config = {
        "Data": {"name": "acdc"},
        "Trainer": {"max_epoch": 10},
        "OPT": {"num_classes": 4},
        "MeanTeacherParameters": {"weight": 10, "alpha": 0.99,
                                  "weight_decay": 1e-6, "update_bn": False,
                                  "num_teachers": 1, "hard_clip": False},
        "EntropyMinParameters": {"weight": 0.001},
        "ConsistencyParameters": {"weight": 1.0},
        "InfonceParams": {"feature_names": "Conv5", "weights": 1.0,
                          "contrast_ons": "partition", "spatial_size": 1},
        "CrossCorrelationParameters": {
            "feature_name": "Up_conv2", "train_encoder": True,
            "num_clusters": 20, "head_type": "mlp", "num_subheads": 1,
            "save": False,
            "hooks": {"cc": {"weight": 0.1, "kernel_size": 5,
                             "diff_power": 0.75},
                      "rr": {"weight": 1, "symmetric": True, "lamda": 1.5,
                             "alpha": 0.5}}},
    }

    class FakeTrainer:
        inference_hook = None

        def set_model4inference(self, hook):
            self.inference_hook = hook

    trainer = FakeTrainer()
    hooks = create_hook_from_config(config, trainer=trainer)
    names = [h.name for h in hooks]
    assert "mt" in names and "entropy" in names and "consistency" in names
    assert "infonce/Conv5/partition" in names
    assert "cc_Up_conv2" in names
    assert trainer.inference_hook is not None
    # pretrain rejects mt
    with pytest.raises(RuntimeError):
        create_hook_from_config(config, is_pretrain=True, trainer=trainer)


def test_cc_pretrain_train_encoder_false_freezes_encoder():
    """main_cc.py:93-96: CrossCorrelationParameters.train_encoder=false must
    freeze the whole encoder during cc pretraining (optax label tree)."""
    from contrastyou_tpu.trainers import PretrainEncoderTrainer

    tr = PretrainEncoderTrainer.__new__(PretrainEncoderTrainer)
    tr._config = {"CrossCorrelationParameters": {"train_encoder": False}}
    tr._hooks = [INFONCEHook(name="nce", feature_name="Up_conv2", weight=1.0,
                             contrast_on="partition", spatial_size=(20, 20))]
    tr._until = None
    label_fn = tr._param_labels()
    bundle = _bundle()
    model_labels, _ = label_fn((bundle.params, {}))
    flat = {k: set(jax.tree.leaves(v)) for k, v in model_labels.items()}
    for enc in ("Conv1", "Conv2", "Conv3", "Conv4", "Conv5"):
        assert flat[enc] == {"freeze"}, enc
    assert flat["Up_conv2"] == {"train"}       # the hooked decoder layer
    assert flat["Deconv_1x1"] == {"freeze"}    # after the deepest tap

    # default (train_encoder true / absent): encoder stays trainable
    tr._config = {}
    model_labels2, _ = tr._param_labels()((bundle.params, {}))
    assert set(jax.tree.leaves(model_labels2["Conv1"])) == {"train"}


def test_pretrain_step_truncated_and_frozen():
    bundle = _bundle()
    hooks = [INFONCEHook(name="nce", feature_name="Conv5", weight=1.0,
                         contrast_on="partition")]
    until = feature_until_from_hooks(*hooks)
    assert until == "Conv5"

    from contrastyou_tpu.models import trainable_mask

    def label_fn(trainables):
        params, hook_params = trainables
        mask = trainable_mask(params, elements=UNet.arch_elements,
                              enable=False, start="Conv5",
                              include_start=False)
        return (jax.tree.map(lambda m: "train" if m else "freeze", mask),
                jax.tree.map(lambda _: "train", hook_params))

    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=2, steps_per_epoch=2,
                                    param_labels=label_fn)
    state = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    step = build_pretrain_step(bundle, optimizer, hooks, until=until)
    batch = {"image": jnp.asarray(np.random.default_rng(0).random(
        (6, H, H, 1), np.float32)),
        "partition": jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32),
        "scan_id": jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32),
        "patient": jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32),
        "cycle": jnp.zeros((6,), jnp.int32)}
    state_snap = jax.tree.map(jnp.array, state)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3), jnp.int32(0))
    state = state_snap
    assert np.isfinite(float(metrics["reg_loss"]))
    # encoder moved, decoder frozen
    enc0 = np.asarray(jax.tree.leaves(state.params["Conv1"])[0])
    enc1 = np.asarray(jax.tree.leaves(new_state.params["Conv1"])[0])
    dec0 = np.asarray(jax.tree.leaves(state.params["Up_conv2"])[0])
    dec1 = np.asarray(jax.tree.leaves(new_state.params["Up_conv2"])[0])
    assert not np.allclose(enc0, enc1)
    np.testing.assert_array_equal(dec0, dec1)
    # projector (hook params) moved
    hp0 = np.asarray(jax.tree.leaves(state.hook_params["nce"])[0])
    hp1 = np.asarray(jax.tree.leaves(new_state.hook_params["nce"])[0])
    assert not np.allclose(hp0, hp1)
