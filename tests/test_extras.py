"""Round-3 extras: named schedulers (poly/step), the loss-free EMA eval
hook, and flip-TTA inference — capability additions beyond the reference
surface (ROADMAP round-3 candidates)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.engine.bundle import ModelBundle
from contrastyou_tpu.engine.optim import warmup_schedule
from contrastyou_tpu.engine.steps import build_eval_step
from contrastyou_tpu.hooks.mt import EMAEvalTrainerHook
from contrastyou_tpu.models import UNet


# --- schedulers -----------------------------------------------------------

def test_poly_schedule_shape():
    s = warmup_schedule(base_lr=1e-3, multiplier=10, warmup_max_epoch=2,
                        max_epoch=12, steps_per_epoch=10, name="poly",
                        power=0.9, eta_min=0.0)
    peak = 1e-2
    assert np.isclose(float(s(0)), 1e-3)
    assert np.isclose(float(s(20)), peak, rtol=1e-3)
    # poly decay: peak * (1 - t/T)^0.9 halfway through the remaining steps
    mid = float(s(20 + 50))
    assert np.isclose(mid, peak * 0.5 ** 0.9, rtol=1e-2)
    assert float(s(20 + 100)) <= 1e-5


def test_step_schedule_milestones():
    s = warmup_schedule(base_lr=1e-3, multiplier=1, warmup_max_epoch=0,
                        max_epoch=30, steps_per_epoch=10, name="step",
                        milestones=(10, 20), gamma=0.1)
    assert np.isclose(float(s(5)), 1e-3)
    assert np.isclose(float(s(105)), 1e-4, rtol=1e-4)
    assert np.isclose(float(s(205)), 1e-5, rtol=1e-4)


def test_step_schedule_milestones_clamped_accumulate():
    """ADVICE r3: milestones at/before warmup_max_epoch clamp to the same
    boundary — each must still contribute one gamma decay (no dict
    collapse)."""
    s = warmup_schedule(base_lr=1e-3, multiplier=1, warmup_max_epoch=10,
                        max_epoch=30, steps_per_epoch=10, name="step",
                        milestones=(5, 8), gamma=0.1)
    # both milestones clamp to the warmup join: two decays apply after it
    assert np.isclose(float(s(150)), 1e-5, rtol=1e-4)


def test_unknown_schedule_raises():
    with pytest.raises(KeyError):
        warmup_schedule(base_lr=1e-3, multiplier=1, warmup_max_epoch=0,
                        max_epoch=1, steps_per_epoch=1, name="nope")


# --- EMA eval hook --------------------------------------------------------

def _tiny_bundle():
    model = UNet(input_dim=1, num_classes=3, max_channel=128,
                 dtype=jnp.float32)
    return ModelBundle.create(model, jax.random.PRNGKey(0), (16, 16, 1))


def test_ema_eval_hook_tracks_params():
    bundle = _tiny_bundle()
    hook = EMAEvalTrainerHook(alpha=0.5, justify_alpha=False)
    _, state = hook.init(jax.random.PRNGKey(0), bundle)

    class Ctx:
        batch_stats = bundle.batch_stats

    new_params = jax.tree.map(lambda p: p + 1.0, bundle.params)
    state = hook.post_step(Ctx(), new_params, state)
    # one EMA step at alpha=0.5: ema = 0.5*old + 0.5*(old+1) = old + 0.5
    got = hook.eval_params(state)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(bundle.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b) + 0.5,
                                   rtol=1e-6, atol=1e-6)
    assert int(state["ema_step"]) == 1
    assert hook.eval_batch_stats(state) is not None
    assert hook.weight == 0.0 and hook.always_active


def test_ema_eval_created_from_config_and_wired():
    from contrastyou_tpu.hooks.creator import create_hook_from_config

    class FakeTrainer:
        hook = None

        def set_model4inference(self, h):
            self.hook = h

    tr = FakeTrainer()
    hooks = create_hook_from_config(
        {"EvalEMAParameters": {"alpha": 0.9},
         "Data": {"name": "acdc"}, "Trainer": {"max_epoch": 5}}, trainer=tr)
    names = [h.name for h in hooks]
    assert "ema_eval" in names
    assert tr.hook is hooks[names.index("ema_eval")]


def test_ema_eval_takes_precedence_over_mt():
    """ADVICE r3: an explicit EvalEMAParameters must win over the MT teacher
    for inference (previously set_model4inference(mt) overwrote it)."""
    from contrastyou_tpu.hooks.creator import create_hook_from_config

    class FakeTrainer:
        hook = None

        def set_model4inference(self, h):
            self.hook = h

    tr = FakeTrainer()
    hooks = create_hook_from_config(
        {"EvalEMAParameters": {"alpha": 0.9},
         "MeanTeacherParameters": {"alpha": 0.999, "weight": 1.0},
         "Data": {"name": "acdc"}, "Trainer": {"max_epoch": 5}}, trainer=tr)
    names = [h.name for h in hooks]
    assert tr.hook is hooks[names.index("ema_eval")]


def test_num_teachers_gt1_raises():
    """Ref semi_seg/hooks/mt.py:94-95 errors for num_teachers>1; the creator
    must match rather than silently dropping the key."""
    from contrastyou_tpu.hooks.creator import create_hook_from_config
    with pytest.raises(NotImplementedError):
        create_hook_from_config(
            {"MeanTeacherParameters": {"alpha": 0.999, "weight": 1.0,
                                       "num_teachers": 2},
             "Data": {"name": "acdc"}, "Trainer": {"max_epoch": 5}})
    # num_teachers=1 stays fine
    hooks = create_hook_from_config(
        {"MeanTeacherParameters": {"alpha": 0.999, "weight": 1.0,
                                   "num_teachers": 1},
         "Data": {"name": "acdc"}, "Trainer": {"max_epoch": 5}})
    assert any(h.name == "mt" for h in hooks)


# --- TTA ------------------------------------------------------------------

def test_tta_eval_step_matches_manual_flip_average():
    bundle = _tiny_bundle()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 3, (2, 16, 16)), jnp.int32)
    mask = jnp.ones((2,), bool)

    step = build_eval_step(bundle, tta=True)
    loss, pred, inter, union = step(bundle.params, bundle.batch_stats,
                                    img, tgt, mask)

    def probs(x):
        logits, _ = bundle.apply_eval(bundle.params, bundle.batch_stats, x)
        return jax.nn.softmax(logits, axis=-1)

    manual = (probs(img)
              + probs(img[:, :, ::-1])[:, :, ::-1]
              + probs(img[:, ::-1])[:, ::-1]
              + probs(img[:, ::-1, ::-1])[:, ::-1, ::-1]) / 4.0
    np.testing.assert_allclose(np.asarray(pred),
                               np.asarray(jnp.argmax(manual, -1)))
    assert np.isfinite(float(loss))
    assert inter.shape == (2, 3) and union.shape == (2, 3)
