"""Learning-convergence proof: supervised training on the synthetic dataset
must reach a high 3D dice — the whole system (data, aug, model, step, meters,
eval) actually learns, not just runs."""
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.augment import CenterCrop, RandomCrop
from contrastyou_tpu.data import (ACDCDataset, BatchLoader,
                                  InfiniteRandomSampler, ScanBatchSampler,
                                  synthesize_acdc_like)
from contrastyou_tpu.models import UNet
from contrastyou_tpu.trainers import FineTuneTrainer

SIZE = 48


@pytest.mark.slow
def test_supervised_training_reaches_high_dice(tmp_path):
    synthesize_acdc_like(tmp_path / "d", num_train_scans=6, num_val_scans=3,
                         slices_per_scan=8, size=SIZE, num_classes=4)
    tra = ACDCDataset(root_dir=str(tmp_path / "d"), mode="train",
                      transforms=RandomCrop(SIZE))
    test = ACDCDataset(root_dir=str(tmp_path / "d"), mode="val",
                       transforms=CenterCrop(SIZE))
    lab = BatchLoader(tra, sampler=InfiniteRandomSampler(len(tra), seed=0),
                      batch_size=8)
    val = BatchLoader(test, batch_sampler=ScanBatchSampler(test),
                      infinite=False)
    trainer = FineTuneTrainer(
        model=UNet(input_dim=1, num_classes=4, max_channel=128,
                   dtype=jnp.float32),
        labeled_loader=lab, val_loader=val, test_loader=None,
        save_dir=str(tmp_path / "run"), max_epoch=18, num_batches=15,
        config={"Optim": {"name": "adam", "lr": 3e-3}}, seed=0)
    trainer.init()
    best = trainer.start_training()
    # concentric-ellipse synthetic structures are easy; a learning system
    # must exceed 0.6 volumetric dice on held-out scans in this budget
    assert best > 0.6, f"val DSC_mean only reached {best:.3f}"
    df = trainer._storage.summary()
    col = [c for c in df.columns if "sup_loss" in c][0]
    assert df[col].iloc[-1] < df[col].iloc[0] * 0.7
