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


def test_majority_pool_labels_alignment():
    """Labels pooled to the feature grid must be each window's area-majority
    id — not the corner pixel the old strided slicing picked — and must track
    a known geometric shift of the id map."""
    from contrastyou_tpu.hooks.infonce import majority_pool_labels

    H = FW = 16
    fh = fw = 4  # 4x4 windows
    ids = np.zeros((1, H, FW), np.int32)
    # block-constant map aligned to the feature grid
    for i in range(fh):
        for j in range(fw):
            ids[0, i * 4:(i + 1) * 4, j * 4:(j + 1) * 4] = i * fw + j
    got = np.asarray(majority_pool_labels(jnp.asarray(ids), fh, fw))
    want = np.arange(fh * fw).reshape(1, fh, fw)
    np.testing.assert_array_equal(got, want)

    # shift the map by 1 px: each window still holds a 3x4 (or larger)
    # majority of its original id -> pooled labels unchanged; the corner-pixel
    # rule would have flipped the first row/col to the neighbor's id
    shifted = np.roll(ids, 1, axis=1)
    got_shift = np.asarray(majority_pool_labels(jnp.asarray(shifted), fh, fw))
    np.testing.assert_array_equal(got_shift, want)
    corner = shifted[:, ::4, ::4]  # old strided rule
    assert not np.array_equal(corner, want)


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
