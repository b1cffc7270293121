import time

import numpy as np
import pytest

from contrastyou_tpu import native
from contrastyou_tpu.data import (ACDCDataset, BatchLoader,
                                  InfiniteRandomSampler, synthesize_acdc_like)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_fast_loader_batches(tmp_path):
    synthesize_acdc_like(tmp_path, num_train_scans=3, num_val_scans=1,
                         slices_per_scan=6, size=64)
    ds = ACDCDataset(root_dir=str(tmp_path), mode="train", transforms=None)
    ds.preload()
    loader = BatchLoader(ds, sampler=InfiniteRandomSampler(len(ds), seed=0),
                         batch_size=4, fast_crop=(48, 48, "random"))
    it = iter(loader)
    b = next(it)
    assert b["image"].shape == (4, 48, 48, 1)
    assert b["image"].dtype == np.float32
    assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
    assert b["target"].shape == (4, 48, 48)
    assert b["scan_id"].min() >= 0
    assert all(s.startswith("patient") for s in b["scan"])
    # labels consistent with image content: crop came from the same slice
    assert set(np.unique(b["target"])) <= {0, 1, 2, 3}


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_fast_loader_center_deterministic(tmp_path):
    synthesize_acdc_like(tmp_path, num_train_scans=2, num_val_scans=1,
                         slices_per_scan=4, size=64)
    ds = ACDCDataset(root_dir=str(tmp_path), mode="train", transforms=None)
    ds.preload()
    loader = BatchLoader(ds, sampler=range(len(ds)), batch_size=4,
                         infinite=False, fast_crop=(48, 48, "center"))
    b1 = next(iter(loader))
    b2 = next(iter(loader))
    np.testing.assert_array_equal(b1["image"], b2["image"])


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_fast_loader_throughput(tmp_path):
    """The preloaded native path must assemble batches far faster than the
    PIL/transform path (it has to feed a TPU that trains >50k slices/s)."""
    synthesize_acdc_like(tmp_path, num_train_scans=6, num_val_scans=1,
                         slices_per_scan=10, size=256)
    ds = ACDCDataset(root_dir=str(tmp_path), mode="train", transforms=None)
    ds.preload()
    loader = BatchLoader(ds, sampler=InfiniteRandomSampler(len(ds), seed=0),
                         batch_size=32, fast_crop=(224, 224, "random"),
                         num_threads=8)
    it = iter(loader)
    next(it)  # warm
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        next(it)
    dt = time.perf_counter() - t0
    slices_per_sec = n * 32 / dt
    # generous floor: absolute numbers live in BENCH_NOTES.md (~8.4k on an
    # idle host); CI machines may be contended
    assert slices_per_sec > 500, f"only {slices_per_sec:.0f} slices/s"
