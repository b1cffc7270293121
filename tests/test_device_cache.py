"""Device-resident dataset cache: HBM-staged split + in-graph sample/crop
(data/device_cache.py) and the fully device-fed train step / Trainer path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.augment import CenterCrop, RandomCrop
from contrastyou_tpu.data import (ACDCDataset, BatchLoader,
                                  InfiniteRandomSampler, ScanBatchSampler,
                                  split_dataset, synthesize_acdc_like)
from contrastyou_tpu.data.device_cache import DeviceDataCache
from contrastyou_tpu.hooks import ConsistencyTrainerHook
from contrastyou_tpu.models import UNet
from contrastyou_tpu.trainers import SemiTrainer

SIZE = 48
CROP = 32  # must be divisible by 16 (UNet pools 4x)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache_data")
    synthesize_acdc_like(root, num_train_scans=4, num_val_scans=2,
                         slices_per_scan=6, size=SIZE)
    return root


@pytest.fixture(scope="module")
def dataset(data_root):
    return ACDCDataset(root_dir=str(data_root), mode="train",
                       transforms=RandomCrop(CROP))


def test_cache_staging_and_metadata(dataset):
    cache = DeviceDataCache.from_dataset(dataset, crop=CROP)
    assert len(cache) == len(dataset)
    assert cache.crop == CROP
    # staged as u8 wire format (data/wire.py) — sample() restores f32/255
    assert cache._images.dtype == jnp.uint8
    sampled = cache.sample(jax.random.PRNGKey(0), 2)
    assert sampled["image"].dtype == jnp.float32
    assert float(sampled["image"].max()) <= 1.0
    # every item's scan id indexes its scan name
    item0 = dataset[0]
    assert cache.scan_names[int(cache._scan_id[0])] == item0["scan"]
    assert DeviceDataCache.fits(dataset)


def test_sample_shapes_and_determinism(dataset):
    cache = DeviceDataCache.from_dataset(dataset, crop=CROP)
    key = jax.random.PRNGKey(3)
    b1 = cache.sample(key, 6)
    b2 = cache.sample(key, 6)
    assert b1["image"].shape == (6, CROP, CROP, 1)
    assert b1["target"].shape == (6, CROP, CROP)
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
    b3 = cache.sample(jax.random.PRNGKey(4), 6)
    assert not np.array_equal(np.asarray(b1["image"]), np.asarray(b3["image"]))
    # targets are slices of the staged volume (int labels in range)
    assert int(b1["target"].max()) <= 3


def test_sample_is_jittable(dataset):
    cache = DeviceDataCache.from_dataset(dataset, crop=CROP)
    f = jax.jit(lambda k: cache.sample(k, 4)["image"].sum())
    assert np.isfinite(float(f(jax.random.PRNGKey(0))))


def test_cached_trainer_end_to_end(tmp_path, data_root, dataset):
    """Trainer(device_cache=True): zero host batches in the hot loop; dice
    grouping works off the in-graph scan ids; checkpoints land."""
    lab_set, unlab_set, *_ = split_dataset(dataset, 2, seed=1)
    lab = BatchLoader(lab_set,
                      sampler=InfiniteRandomSampler(len(lab_set), seed=0),
                      batch_size=4)
    unlab = BatchLoader(unlab_set,
                        sampler=InfiniteRandomSampler(len(unlab_set), seed=0),
                        batch_size=4)
    val_set = ACDCDataset(root_dir=str(data_root), mode="val",
                          transforms=CenterCrop(CROP))
    val = BatchLoader(val_set, batch_sampler=ScanBatchSampler(val_set),
                      infinite=False)
    trainer = SemiTrainer(
        model=UNet(input_dim=1, num_classes=4, max_channel=128,
                   dtype=jnp.float32),
        labeled_loader=lab, unlabeled_loader=unlab, val_loader=val,
        save_dir=str(tmp_path / "run"), max_epoch=2, num_batches=4,
        unroll_steps=2, device_cache=True, seed=0,
        config={"Optim": {"name": "adam", "lr": 1e-3}})
    trainer.register_hooks(ConsistencyTrainerHook(weight=0.1))
    trainer.init()
    score = trainer.start_training()
    assert np.isfinite(score)
    assert (tmp_path / "run" / "storage.csv").exists()
    assert (tmp_path / "run" / "last").exists()


def test_mxu_crop_matches_slice_crop(monkeypatch, dataset):
    """The one-hot-matmul random crop (TPU default; the vmapped
    dynamic_slice lowers to a serialized DS+DUS loop there) is BIT-exact
    vs the slice form through the public sample()."""
    import contrastyou_tpu.data.device_cache as dc
    cache = DeviceDataCache.from_dataset(dataset, crop=CROP)
    key = jax.random.PRNGKey(7)
    monkeypatch.setenv("CONTRASTYOU_MXU_CROP", "0")
    a = cache.sample(key, 6)
    monkeypatch.setenv("CONTRASTYOU_MXU_CROP", "1")
    b = cache.sample(key, 6)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    assert b["image"].dtype == a["image"].dtype
    assert b["target"].dtype == a["target"].dtype
