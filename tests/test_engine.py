import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.data import (ACDCDataset, BatchLoader, InfiniteRandomSampler,
                                  ScanBatchSampler, split_dataset,
                                  synthesize_acdc_like)
from contrastyou_tpu.augment import transform_zoo, CenterCrop, RandomCrop
from contrastyou_tpu.hooks import (ConsistencyTrainerHook, EntropyMinTrainerHook,
                                   PseudoLabelTrainerHook)
from contrastyou_tpu.models import UNet
from contrastyou_tpu.trainers import FineTuneTrainer, SemiTrainer, trainer_zoo


SIZE = 32


def _loaders(tmp_path, seed=0):
    synthesize_acdc_like(tmp_path, num_train_scans=4, num_val_scans=2,
                         slices_per_scan=6, size=SIZE)
    tra = ACDCDataset(root_dir=str(tmp_path), mode="train",
                      transforms=RandomCrop(SIZE))
    test = ACDCDataset(root_dir=str(tmp_path), mode="val",
                       transforms=CenterCrop(SIZE))
    lab_set, unlab_set, *_ = split_dataset(tra, 2, seed=1)
    lab = BatchLoader(lab_set, sampler=InfiniteRandomSampler(len(lab_set), seed=seed),
                      batch_size=4)
    unlab = BatchLoader(unlab_set,
                        sampler=InfiniteRandomSampler(len(unlab_set), seed=seed),
                        batch_size=4)
    val_set, test_set = split_dataset(test, 1)
    val = BatchLoader(val_set, batch_sampler=ScanBatchSampler(val_set),
                      infinite=False)
    tst = BatchLoader(test_set, batch_sampler=ScanBatchSampler(test_set),
                      infinite=False)
    return lab, unlab, val, tst


def _model():
    return UNet(input_dim=1, num_classes=4, max_channel=128,
                dtype=jnp.float32)


CONFIG = {"Optim": {"name": "adam", "lr": 1e-3, "weight_decay": 0.0},
          "Scheduler": {"multiplier": 1, "warmup_max": 1}}


def test_ft_trainer_end_to_end(tmp_path):
    lab, unlab, val, tst = _loaders(tmp_path / "d")
    trainer = FineTuneTrainer(model=_model(), labeled_loader=lab,
                              unlabeled_loader=None, val_loader=val,
                              test_loader=tst, save_dir=str(tmp_path / "run"),
                              max_epoch=2, num_batches=6, config=CONFIG, seed=0)
    trainer.init()
    best = trainer.start_training()
    # training happened and artifacts exist
    assert (tmp_path / "run" / "storage.csv").exists()
    assert (tmp_path / "run" / "last").is_dir()
    assert (tmp_path / "run" / "best").is_dir()
    assert (tmp_path / "run" / ".success").exists()
    assert np.isfinite(best)
    # loss went down over two epochs of supervised training
    df = trainer._storage.summary()
    col = [c for c in df.columns if "sup_loss" in c][0]
    assert df[col].iloc[-1] < df[col].iloc[0]


def test_semi_trainer_with_hooks(tmp_path):
    lab, unlab, val, tst = _loaders(tmp_path / "d")
    trainer = SemiTrainer(model=_model(), labeled_loader=lab,
                          unlabeled_loader=unlab, val_loader=val,
                          test_loader=None, save_dir=str(tmp_path / "run"),
                          max_epoch=1, num_batches=4, config=CONFIG,
                          two_stage=True, seed=0)
    trainer.register_hooks(ConsistencyTrainerHook(weight=0.5),
                           EntropyMinTrainerHook(weight=0.01),
                           PseudoLabelTrainerHook(weight=0.01))
    trainer.init()
    trainer.start_training()
    df = trainer._storage.summary()
    reg_cols = [c for c in df.columns if "reg_loss" in c]
    assert reg_cols and np.isfinite(df[reg_cols[0]].iloc[-1])
    cons_cols = [c for c in df.columns if "consistency" in c]
    assert cons_cols, df.columns.tolist()


def test_resume_roundtrip(tmp_path):
    lab, unlab, val, tst = _loaders(tmp_path / "d")
    trainer = FineTuneTrainer(model=_model(), labeled_loader=lab,
                              val_loader=val, test_loader=None,
                              save_dir=str(tmp_path / "run"), max_epoch=1,
                              num_batches=3, config=CONFIG, seed=0)
    trainer.init()
    trainer.start_training()
    saved_step = int(trainer.state.step)
    saved_params = trainer.state.params

    lab2, _, val2, _ = _loaders(tmp_path / "d2")
    trainer2 = FineTuneTrainer(model=_model(), labeled_loader=lab2,
                               val_loader=val2, test_loader=None,
                               save_dir=str(tmp_path / "run2"), max_epoch=1,
                               num_batches=3, config=CONFIG, seed=0)
    trainer2.init()
    trainer2.resume_from_path(str(tmp_path / "run" / "last"))
    assert int(trainer2.state.step) == saved_step
    assert trainer2._cur_epoch == 1
    a = jax.tree.leaves(saved_params)[0]
    b = jax.tree.leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_inference_writes_json(tmp_path):
    lab, unlab, val, tst = _loaders(tmp_path / "d")
    trainer = SemiTrainer(model=_model(), labeled_loader=lab,
                          unlabeled_loader=unlab, val_loader=None,
                          test_loader=tst, save_dir=str(tmp_path / "run"),
                          max_epoch=1, num_batches=2, config=CONFIG, seed=0)
    trainer.init()
    result = trainer.inference()
    assert "dice" in result and "asd" in result
    assert (tmp_path / "run" / "inference_result.json").exists()
    loaded = json.loads((tmp_path / "run" / "inference_result.json").read_text())
    assert "DSC_mean" in loaded["dice"]


def test_trainer_zoo():
    assert trainer_zoo["semi"] is SemiTrainer
    assert trainer_zoo["ft"] is FineTuneTrainer


def test_warm_start_from_checkpoint(tmp_path):
    """Arch.checkpoint path: extract only model params from a full training
    checkpoint and warm-start a fresh trainer (ref main.py:51-58)."""
    from contrastyou_tpu.engine.checkpoint import extract_model_params

    lab, unlab, val, tst = _loaders(tmp_path / "d")
    t1 = FineTuneTrainer(model=_model(), labeled_loader=lab, val_loader=val,
                         test_loader=None, save_dir=str(tmp_path / "a"),
                         max_epoch=1, num_batches=2, config=CONFIG, seed=0)
    t1.init()
    t1.start_training()
    trained = t1.state.params

    lab2, _, val2, _ = _loaders(tmp_path / "d2")
    t2 = FineTuneTrainer(model=_model(), labeled_loader=lab2, val_loader=val2,
                         test_loader=None, save_dir=str(tmp_path / "b"),
                         max_epoch=1, num_batches=2, config=CONFIG, seed=99)
    params = extract_model_params(str(tmp_path / "a" / "last"),
                                  t1.state.params)
    t2.load_model_params(params)  # before init -> warm start
    t2.init()
    a = np.asarray(jax.tree.leaves(trained)[0])
    b = np.asarray(jax.tree.leaves(t2.state.params)[0])
    np.testing.assert_allclose(a, b)
    # optimizer state is FRESH (only model weights transferred)
    t2.start_training()  # and training continues fine


def test_training_is_deterministic(tmp_path):
    """Same seed -> bit-identical params after training (the JAX-native form
    of the reference's torch.use_deterministic_algorithms, main.py:112)."""
    results = []
    for run in range(2):
        lab, unlab, val, tst = _loaders(tmp_path / f"d{run}")
        t = FineTuneTrainer(model=_model(), labeled_loader=lab,
                            val_loader=None, test_loader=None,
                            save_dir=str(tmp_path / f"r{run}"), max_epoch=1,
                            num_batches=3, config=CONFIG, seed=7)
        t.init()
        t.start_training()
        results.append(np.asarray(jax.tree.leaves(t.state.params)[0]))
    np.testing.assert_array_equal(results[0], results[1])
