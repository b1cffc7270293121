"""Hook figure emission: fig/ metrics are excluded from meters and rendered
to TensorBoard on the first batch of each epoch."""
import jax.numpy as jnp
import numpy as np

from contrastyou_tpu.augment import CenterCrop, RandomCrop
from contrastyou_tpu.data import (ACDCDataset, BatchLoader,
                                  InfiniteRandomSampler, ScanBatchSampler,
                                  split_dataset, synthesize_acdc_like)
from contrastyou_tpu.hooks.infonce import INFONCEHook
from contrastyou_tpu.models import UNet
from contrastyou_tpu.trainers import SemiTrainer

SIZE = 32


def test_figures_logged_and_not_metered(tmp_path):
    synthesize_acdc_like(tmp_path / "d", num_train_scans=4, num_val_scans=3,
                         slices_per_scan=6, size=SIZE)
    tra = ACDCDataset(root_dir=str(tmp_path / "d"), mode="train",
                      transforms=RandomCrop(SIZE))
    lab_set, unlab_set, *_ = split_dataset(tra, 2, seed=1)
    lab = BatchLoader(lab_set, sampler=InfiniteRandomSampler(len(lab_set)),
                      batch_size=3)
    unlab = BatchLoader(unlab_set,
                        sampler=InfiniteRandomSampler(len(unlab_set)),
                        batch_size=3)
    trainer = SemiTrainer(
        model=UNet(input_dim=1, num_classes=4, max_channel=128,
                   dtype=jnp.float32),
        labeled_loader=lab, unlabeled_loader=unlab, val_loader=None,
        test_loader=None, save_dir=str(tmp_path / "run"), max_epoch=1,
        num_batches=2, two_stage=True,
        config={"Optim": {"name": "adam", "lr": 1e-3}}, seed=0)
    trainer.register_hooks(
        INFONCEHook(name="nce", feature_name="Conv5", weight=0.1,
                    contrast_on="partition", emit_figures=True))
    trainer.init()
    trainer.start_training()
    # figure tensors were not averaged into the hook meter columns
    df = trainer._storage.summary()
    assert not any("fig" in c for c in df.columns)
    assert any("nce" in c for c in df.columns)
    # tensorboard event files contain data (figures written)
    tb_dir = tmp_path / "run" / "tensorboard"
    events = list(tb_dir.glob("events*"))
    assert events and events[0].stat().st_size > 500
