"""One-tiny-epoch smoke of every trainer in the zoo not covered elsewhere
(SURVEY.md §4: 'one-epoch CPU smoke of every trainer in the zoo')."""
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.augment import CenterCrop, RandomCrop
from contrastyou_tpu.data import (ACDCDataset, BatchLoader,
                                  InfiniteRandomSampler, ScanBatchSampler,
                                  split_dataset, synthesize_acdc_like)
from contrastyou_tpu.hooks import (DifferentiableMeanTeacherTrainerHook,
                                   INFONCEHook, MixUpTrainHook)
from contrastyou_tpu.models import UNet
from contrastyou_tpu.trainers import (AdversarialTrainer, DMTTrainer,
                                      MixUpTrainer, MulticoreTrainer,
                                      PretrainDecoderTrainer)
from contrastyou_tpu.trainers.pretrain import get_contrastive_loader

SIZE = 32
CONFIG = {"Optim": {"name": "adam", "lr": 1e-3}}


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    root = tmp_path_factory.mktemp("zoo")
    synthesize_acdc_like(root, num_train_scans=4, num_val_scans=3,
                         slices_per_scan=6, size=SIZE)
    tra = ACDCDataset(root_dir=str(root), mode="train",
                      transforms=RandomCrop(SIZE))
    test = ACDCDataset(root_dir=str(root), mode="val",
                       transforms=CenterCrop(SIZE))
    lab_set, unlab_set, *_ = split_dataset(tra, 2, seed=1)
    def mk():
        lab = BatchLoader(lab_set,
                          sampler=InfiniteRandomSampler(len(lab_set)),
                          batch_size=3)
        unlab = BatchLoader(unlab_set,
                            sampler=InfiniteRandomSampler(len(unlab_set)),
                            batch_size=3)
        val = BatchLoader(test, batch_sampler=ScanBatchSampler(test),
                          infinite=False)
        return lab, unlab, val
    return tra, mk


def _model():
    return UNet(input_dim=1, num_classes=4, max_channel=128,
                dtype=jnp.float32)


@pytest.mark.slow
def test_dmt_trainer(loaders, tmp_path):
    _, mk = loaders
    lab, unlab, val = mk()
    trainer = DMTTrainer(model=_model(), labeled_loader=lab,
                         unlabeled_loader=unlab, val_loader=val,
                         test_loader=None, save_dir=str(tmp_path / "dmt"),
                         max_epoch=1, num_batches=2, config=CONFIG, seed=0)
    trainer.register_hooks(DifferentiableMeanTeacherTrainerHook(
        name="dmt", method_name="method2", meta_weight=1e-3))
    trainer.init()
    best = trainer.start_training()
    assert np.isfinite(best)
    assert trainer._inference_hook is not None  # evaluates on teacher


@pytest.mark.slow
def test_mixup_trainer(loaders, tmp_path):
    _, mk = loaders
    lab, unlab, val = mk()
    trainer = MixUpTrainer(model=_model(), labeled_loader=lab,
                           unlabeled_loader=None, val_loader=val,
                           test_loader=None, save_dir=str(tmp_path / "mix"),
                           max_epoch=1, num_batches=2, config=CONFIG, seed=0)
    trainer.register_hooks(MixUpTrainHook(hook_name="mixup", weight=0.1))
    trainer.init()
    assert np.isfinite(trainer.start_training())


@pytest.mark.slow
def test_adversarial_trainer(loaders, tmp_path):
    _, mk = loaders
    lab, unlab, val = mk()
    trainer = AdversarialTrainer(model=_model(), labeled_loader=lab,
                                 unlabeled_loader=unlab, val_loader=val,
                                 test_loader=None,
                                 save_dir=str(tmp_path / "adv"), max_epoch=1,
                                 num_batches=2, config=CONFIG, seed=0,
                                 reg_weight=0.01)
    trainer.init()
    best = trainer.start_training()
    assert np.isfinite(best)
    df = trainer._storage.summary()
    assert any("dis_loss" in c for c in df.columns)


@pytest.mark.slow
def test_multicore_trainer(loaders, tmp_path):
    _, mk = loaders
    lab, unlab, val = mk()
    # model predicts 4 true classes x 2 prototypes = 8 channels
    model = UNet(input_dim=1, num_classes=8, max_channel=128,
                 dtype=jnp.float32)
    trainer = MulticoreTrainer(model=model, labeled_loader=lab,
                               unlabeled_loader=unlab, val_loader=val,
                               test_loader=None,
                               save_dir=str(tmp_path / "multicore"),
                               max_epoch=1, num_batches=2, config=CONFIG,
                               seed=0, true_num_classes=4, multiplier=2,
                               two_stage=True)
    trainer.init()
    best = trainer.start_training()
    assert np.isfinite(best)
    assert trainer.num_classes == 4  # dice over TRUE classes


@pytest.mark.slow
def test_pretrain_decoder_trainer(loaders, tmp_path):
    tra, _ = loaders
    contrast = get_contrastive_loader(tra, data_name="acdc",
                                      scan_sample_num=2, seed=0)
    trainer = PretrainDecoderTrainer(
        model=_model(), contrast_loader=contrast,
        save_dir=str(tmp_path / "predec"), max_epoch=1, num_batches=2,
        config=CONFIG, seed=0)
    trainer.register_hooks(INFONCEHook(
        name="nce_dense", feature_name="Up_conv2", weight=1.0,
        contrast_on="self", spatial_size=(8, 8)))
    trainer.init()
    assert trainer.forward_until == "Up_conv2"
    trainer.start_training()
    df = trainer._storage.summary()
    assert any("reg_loss" in c for c in df.columns)
