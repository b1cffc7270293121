import json

import numpy as np
import pytest

from contrastyou_tpu.data import (ACDCDataset, BatchLoader, ContrastBatchSampler,
                                  InfiniteRandomSampler, ScanBatchSampler,
                                  extract_sub_dataset_based_on_scan_names,
                                  get_data, split_dataset,
                                  split_dataset_with_predefined_filenames,
                                  synthesize_acdc_like)
from contrastyou_tpu.augment import transform_zoo


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    synthesize_acdc_like(root, num_train_scans=6, num_val_scans=4,
                         slices_per_scan=9, size=64)
    return str(root)


@pytest.fixture(scope="module")
def train_set(data_root):
    return ACDCDataset(root_dir=data_root, mode="train",
                       transforms=None)


def test_dataset_basics(train_set):
    assert len(train_set) == 6 * 9
    assert len(train_set.get_scan_list()) == 6
    item = train_set[0]
    assert item["image"].shape == (64, 64, 1)
    assert item["target"].shape == (64, 64)
    assert item["image"].dtype == np.float32
    assert item["scan"].startswith("patient")
    assert 0 <= item["partition"] < 3


def test_partition_covers_range(train_set):
    parts = set(train_set.get_partition_list())
    assert parts == {0, 1, 2}


def test_sub_dataset_extraction(train_set):
    scans = train_set.get_scan_list()[:2]
    sub = extract_sub_dataset_based_on_scan_names(train_set, scans)
    assert sub.get_scan_list() == sorted(scans)
    assert len(sub) == 2 * 9
    # original untouched
    assert len(train_set) == 6 * 9


def test_split_dataset(train_set):
    a, b = split_dataset(train_set, 2, seed=1)
    assert len(a.get_scan_list()) == 2
    assert len(b.get_scan_list()) == 4
    assert not set(a.get_scan_list()) & set(b.get_scan_list())
    # deterministic
    a2, _ = split_dataset(train_set, 2, seed=1)
    assert a.get_scan_list() == a2.get_scan_list()


def test_predefined_ordering_split(train_set, data_root):
    ordering = train_set.get_scan_list()
    path = f"{train_set.root_dir}/acdc_ordering_0.json"
    with open(path, "w") as f:
        json.dump(ordering, f)
    lab, unlab = split_dataset_with_predefined_filenames(train_set, "acdc", 2,
                                                         order_num=0)
    assert lab.get_scan_list() == sorted(ordering[:2])


def test_infinite_sampler():
    s = InfiniteRandomSampler(5, seed=0)
    it = iter(s)
    first12 = [next(it) for _ in range(12)]
    assert set(first12[:5]) == set(range(5))  # full permutation per epoch


def test_infinite_sampler_process_sharding():
    """Multi-host input sharding: same seed, different process_index ->
    disjoint strides of the SAME permutation, union covering the dataset."""
    n, pc = 16, 2
    samplers = [InfiniteRandomSampler(n, seed=7, process_index=pi,
                                      process_count=pc) for pi in range(pc)]
    per_proc = n // pc
    streams = [[next(it) for _ in range(2 * per_proc)]
               for it in map(iter, samplers)]
    for epoch in range(2):
        blocks = [set(s[epoch * per_proc:(epoch + 1) * per_proc])
                  for s in streams]
        assert blocks[0].isdisjoint(blocks[1])
        assert blocks[0] | blocks[1] == set(range(n))


def test_scan_batch_sampler(train_set):
    s = ScanBatchSampler(train_set)
    batches = list(s)
    assert len(batches) == 6
    assert all(len(b) == 9 for b in batches)
    stems = train_set.get_stem_list()
    for b in batches:
        scans = {train_set.get_scan_name(stems[i]) for i in b}
        assert len(scans) == 1


def test_contrast_batch_sampler(train_set):
    s = ContrastBatchSampler(train_set, scan_sample_num=3,
                             partition_sample_num=1)
    batch = next(iter(s))
    stems = train_set.get_stem_list()
    scans = {train_set.get_scan_name(stems[i]) for i in batch}
    assert len(scans) == 3
    # per scan: one slice per partition (3 partitions)
    assert len(batch) == 9


def test_batch_loader_fixed_shapes(train_set):
    spec = transform_zoo["acdc"]()
    train_set.transforms = spec.train
    loader = BatchLoader(train_set,
                         sampler=InfiniteRandomSampler(len(train_set), seed=0),
                         batch_size=4)
    it = iter(loader)
    b = next(it)
    assert b["image"].shape == (4, 224, 224, 1)
    assert b["target"].shape == (4, 224, 224)
    assert b["mask"].all()
    assert b["scan_id"].min() >= 0
    train_set.transforms = None


def test_batch_loader_scan_batches_padded(train_set):
    loader = BatchLoader(train_set, batch_sampler=ScanBatchSampler(train_set),
                         infinite=False)
    batches = list(loader)
    assert len(batches) == 6
    for b in batches:
        assert b["image"].shape[0] == 9
        assert b["mask"].all()


def test_get_data_end_to_end(data_root, train_set):
    ordering = sorted(train_set.get_scan_list())
    with open(f"{train_set.root_dir}/acdc_ordering_0.json", "w") as f:
        json.dump(ordering, f)
    lab, unlab, val, test = get_data(
        {"name": "acdc", "labeled_scan_num": 2},
        {"batch_size": 3}, {"batch_size": 3}, root_dir=data_root)
    b = next(iter(lab))
    assert b["image"].shape == (3, 224, 224, 1)
    assert len(lab.dataset.get_scan_list()) == 2
    assert len(unlab.dataset.get_scan_list()) == 4
    n_val = len(val.dataset.get_scan_list())
    n_test = len(test.dataset.get_scan_list())
    assert n_val + n_test == 4 and n_val == 1
    vb = next(iter(val))
    assert vb["image"].shape[1:] == (224, 224, 1)
