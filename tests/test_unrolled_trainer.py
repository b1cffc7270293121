"""Trainer-level unrolled stepping: metrics/meters/dice still correct."""
import jax.numpy as jnp
import numpy as np

from contrastyou_tpu.augment import CenterCrop, RandomCrop
from contrastyou_tpu.data import (ACDCDataset, BatchLoader,
                                  InfiniteRandomSampler, ScanBatchSampler,
                                  split_dataset, synthesize_acdc_like)
from contrastyou_tpu.hooks import ConsistencyTrainerHook
from contrastyou_tpu.models import UNet
from contrastyou_tpu.trainers import SemiTrainer

SIZE = 32


def test_semi_trainer_unrolled(tmp_path):
    synthesize_acdc_like(tmp_path / "d", num_train_scans=4, num_val_scans=3,
                         slices_per_scan=6, size=SIZE)
    tra = ACDCDataset(root_dir=str(tmp_path / "d"), mode="train",
                      transforms=RandomCrop(SIZE))
    test = ACDCDataset(root_dir=str(tmp_path / "d"), mode="val",
                       transforms=CenterCrop(SIZE))
    lab_set, unlab_set, *_ = split_dataset(tra, 2, seed=1)
    lab = BatchLoader(lab_set, sampler=InfiniteRandomSampler(len(lab_set)),
                      batch_size=3)
    unlab = BatchLoader(unlab_set,
                        sampler=InfiniteRandomSampler(len(unlab_set)),
                        batch_size=3)
    val = BatchLoader(test, batch_sampler=ScanBatchSampler(test),
                      infinite=False)
    trainer = SemiTrainer(
        model=UNet(input_dim=1, num_classes=4, max_channel=128,
                   dtype=jnp.float32),
        labeled_loader=lab, unlabeled_loader=unlab, val_loader=val,
        test_loader=None, save_dir=str(tmp_path / "run"), max_epoch=1,
        num_batches=4, unroll_steps=2, two_stage=True,
        config={"Optim": {"name": "adam", "lr": 1e-3}}, seed=0)
    trainer.register_hooks(ConsistencyTrainerHook(weight=0.5))
    trainer.init()
    best = trainer.start_training()
    assert np.isfinite(best)
    df = trainer._storage.summary()
    sup = [c for c in df.columns if "sup_loss" in c][0]
    cons = [c for c in df.columns if "consistency" in c]
    assert np.isfinite(df[sup].iloc[-1]) and cons
    assert int(trainer.state.step) == 4  # 2 calls x 2 unrolled steps
