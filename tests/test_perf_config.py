"""Round-4: the Perf knob registry (contrastyou_tpu/perf.py) — config-file
routing, env override precedence, snapshot recording in run dirs, and
self-describing checkpoints that refuse structurally-incompatible resumes
(VERDICT r3 #8/#9)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu import perf
from contrastyou_tpu.trainers import FineTuneTrainer

from test_engine import CONFIG, _loaders, _model


@pytest.fixture(autouse=True)
def _restore_knobs():
    saved = dict(perf.KNOBS)
    yield
    perf.KNOBS.clear()
    perf.KNOBS.update(saved)


def test_apply_config_sets_defaults_env_wins(monkeypatch):
    monkeypatch.delenv("CONTRASTYOU_PLANE_CHAIN", raising=False)
    snap = perf.apply_config({"plane_chain": "0", "fused_twostage": True})
    assert snap["PLANE_CHAIN"] == "0"
    assert snap["FUSED_TWOSTAGE"] == "1"
    monkeypatch.setenv("CONTRASTYOU_PLANE_CHAIN", "1")
    assert perf.get("PLANE_CHAIN") == "1"  # env overrides config
    # but a config value behind an EXPLICIT env var must not clobber env
    perf.apply_config({"plane_chain": "0"})
    assert perf.get("PLANE_CHAIN") == "1"


def test_apply_config_unknown_key_raises():
    with pytest.raises(KeyError):
        perf.apply_config({"not_a_knob": 1})


def test_run_dir_records_perf_snapshot(tmp_path):
    lab, unlab, val, tst = _loaders(tmp_path / "d")
    trainer = FineTuneTrainer(model=_model(), labeled_loader=lab,
                              val_loader=val, test_loader=None,
                              save_dir=str(tmp_path / "run"), max_epoch=1,
                              num_batches=2, config=CONFIG, seed=0)
    from contrastyou_tpu.configure import yaml_load
    dumped = yaml_load(tmp_path / "run" / "config.yaml").to_dict()
    assert dumped["Perf"] == perf.snapshot()


def test_checkpoint_refuses_structural_knob_flip(tmp_path, monkeypatch):
    """Save with FUSED_OPT=1, resume with =0 (and vice versa): the opt_state
    pytree layout differs, so the resume must error clearly instead of
    silently corrupting optimizer moments."""
    for save_v, load_v in (("1", "0"), ("0", "1")):
        monkeypatch.setenv("CONTRASTYOU_FUSED_OPT", save_v)
        lab, unlab, val, tst = _loaders(tmp_path / f"d{save_v}")
        run = tmp_path / f"run{save_v}"
        trainer = FineTuneTrainer(model=_model(), labeled_loader=lab,
                                  val_loader=val, test_loader=None,
                                  save_dir=str(run), max_epoch=1,
                                  num_batches=2, config=CONFIG, seed=0)
        trainer.init()
        trainer.start_training()

        monkeypatch.setenv("CONTRASTYOU_FUSED_OPT", load_v)
        lab2, _, val2, _ = _loaders(tmp_path / f"d{save_v}b")
        trainer2 = FineTuneTrainer(model=_model(), labeled_loader=lab2,
                                   val_loader=val2, test_loader=None,
                                   save_dir=str(tmp_path / f"run{save_v}b"),
                                   max_epoch=1, num_batches=2, config=CONFIG,
                                   seed=0)
        trainer2.init()
        with pytest.raises(RuntimeError, match="FUSED_OPT"):
            trainer2.resume_from_path(str(run / "last"))

        # same knob resumes fine
        monkeypatch.setenv("CONTRASTYOU_FUSED_OPT", save_v)
        trainer3 = FineTuneTrainer(model=_model(), labeled_loader=lab2,
                                   val_loader=val2, test_loader=None,
                                   save_dir=str(tmp_path / f"run{save_v}c"),
                                   max_epoch=1, num_batches=2, config=CONFIG,
                                   seed=0)
        trainer3.init()
        trainer3.resume_from_path(str(run / "last"))
        a = jax.tree.leaves(trainer.state.params)[0]
        b = jax.tree.leaves(trainer3.state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_old_checkpoint_without_snapshot_warns_not_fails():
    from contrastyou_tpu.engine.checkpoint import validate_perf_compat
    validate_perf_compat({"cur_epoch": 3})  # no "perf" key: must not raise
