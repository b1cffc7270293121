"""End-to-end superpixel contrastive pretraining: SLIC generation -> dataset
with the superpixel sub-folder (extras transformed with the same geometry) ->
decoder pretrain with the superpixel-labeled InfoNCE hook."""
import numpy as np
import pytest

import jax.numpy as jnp

from contrastyou_tpu.augment import RandomCrop
from contrastyou_tpu.data import synthesize_acdc_like
from contrastyou_tpu.data.datasets import ACDCSuperPixelDataset
from contrastyou_tpu.hooks import SuperPixelInfoNCEHook
from contrastyou_tpu.models import UNet
from contrastyou_tpu.postprocess import generate_superpixels
from contrastyou_tpu.trainers import PretrainDecoderTrainer
from contrastyou_tpu.trainers.pretrain import get_contrastive_loader

SIZE = 32


@pytest.mark.slow
def test_superpixel_pretrain_end_to_end(tmp_path):
    synthesize_acdc_like(tmp_path, num_train_scans=3, num_val_scans=1,
                         slices_per_scan=6, size=SIZE)
    n = generate_superpixels(tmp_path / "ACDC_contrast", mode="train",
                             n_segments=8)
    assert n == 18
    ds = ACDCSuperPixelDataset(root_dir=str(tmp_path), mode="train",
                               transforms=RandomCrop(SIZE))
    item = ds[0]
    assert "superpixel" in item and item["superpixel"].shape == (SIZE, SIZE)

    loader = get_contrastive_loader(ds, data_name="acdc", scan_sample_num=2,
                                    seed=0)
    batch = next(iter(loader))
    assert "superpixel" in batch
    assert batch["superpixel"].shape[1:] == (SIZE, SIZE)

    trainer = PretrainDecoderTrainer(
        model=UNet(input_dim=1, num_classes=4, max_channel=128,
                   dtype=jnp.float32),
        contrast_loader=loader, save_dir=str(tmp_path / "run"), max_epoch=1,
        num_batches=2, config={"Optim": {"name": "adam", "lr": 1e-3}}, seed=0)
    trainer.register_hooks(SuperPixelInfoNCEHook(
        name="infonce/Up_conv2/superpixel", feature_name="Up_conv2",
        weight=1.0, spatial_size=(8, 8)))
    trainer.init()
    assert trainer.forward_until == "Up_conv2"
    trainer.start_training()
    df = trainer._storage.summary()
    col = [c for c in df.columns if "reg_loss" in c][0]
    assert np.isfinite(df[col].iloc[-1])
