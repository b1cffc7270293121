"""u8 wire format + device prefetch (data/wire.py): lossless-or-fallback
packing, in-graph unwire, step-level bitwise equivalence, and the
prefetcher's ordering/error contract (VERDICT r3 #7 input-path work)."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.data.wire import (DevicePrefetcher, pack_array,
                                       pack_batch, prefetch_depth, unwire)

SHAPE = (4, 48, 48)  # > _MIN_SIZE


# --- pack_array ------------------------------------------------------------

def test_pack_image_exact_grid_roundtrips_bitwise(np_rng):
    from contrastyou_tpu.data.wire import normalize_u8
    k = np_rng.integers(0, 256, SHAPE).astype(np.uint8)
    f = normalize_u8(k)                         # the host pipeline's output
    packed = pack_array(f)
    assert packed.dtype == np.uint8
    np.testing.assert_array_equal(packed, k)
    restored = np.asarray(unwire({"image": jnp.asarray(packed)})["image"])
    np.testing.assert_array_equal(restored, f)  # bitwise

def test_pack_image_offgrid_falls_back(np_rng):
    f = np_rng.random(SHAPE).astype(np.float32)
    packed = pack_array(f)
    assert packed.dtype == np.float32
    assert packed is f


def test_pack_image_out_of_range_falls_back(np_rng):
    f = (np_rng.random(SHAPE).astype(np.float32) * 3.0) - 1.0
    assert pack_array(f).dtype == np.float32


def test_pack_int_ranges(np_rng):
    small = np_rng.integers(0, 4, SHAPE).astype(np.int32)
    assert pack_array(small).dtype == np.uint8
    np.testing.assert_array_equal(pack_array(small), small)
    mid = np_rng.integers(0, 30_000, SHAPE).astype(np.int32)
    assert pack_array(mid).dtype == np.uint16
    np.testing.assert_array_equal(pack_array(mid), mid)
    neg = np_rng.integers(-2, 4, SHAPE).astype(np.int32)
    assert pack_array(neg).dtype == np.int32   # fallback keeps sign
    big = np_rng.integers(0, 2 ** 20, SHAPE).astype(np.int32)
    assert pack_array(big).dtype == np.int32


def test_small_arrays_skip_packing():
    v = np.zeros((8,), np.float32)
    assert pack_array(v).dtype == np.float32


def test_wire_knob_disables(monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_WIRE_U8", "0")
    k = np.zeros(SHAPE, np.float32)
    assert pack_array(k).dtype == np.float32


# --- unwire ------------------------------------------------------------

def test_unwire_key_semantics(np_rng):
    batch = {
        "labeled_image": jnp.asarray(
            np_rng.integers(0, 256, SHAPE), jnp.uint8),
        "labeled_target": jnp.asarray(np_rng.integers(0, 4, SHAPE), jnp.uint8),
        "unlabeled_superpixel": jnp.asarray(
            np_rng.integers(0, 300, SHAPE), jnp.uint16),
        "mask": jnp.ones((4,), bool),
        "plain": jnp.zeros(SHAPE, jnp.float32),
    }
    out = unwire(batch)
    assert out["labeled_image"].dtype == jnp.float32
    assert float(out["labeled_image"].max()) <= 1.0
    assert out["labeled_target"].dtype == jnp.int32
    assert out["unlabeled_superpixel"].dtype == jnp.int32
    assert out["mask"].dtype == bool
    assert out["plain"].dtype == jnp.float32


def test_unwire_traces_under_jit(np_rng):
    u8 = jnp.asarray(np_rng.integers(0, 256, SHAPE), jnp.uint8)

    @jax.jit
    def f(x):
        return unwire({"image": x})["image"].sum()

    assert np.isfinite(float(f(u8)))


def test_pack_batch_maps_array_leaves(np_rng):
    from contrastyou_tpu.data.wire import normalize_u8
    k = np_rng.integers(0, 256, SHAPE).astype(np.uint8)
    batch = {"image": normalize_u8(k),
             "scan": ["a", "b", "c", "d"]}
    out = pack_batch(batch)
    assert out["image"].dtype == np.uint8
    assert out["scan"] == batch["scan"]


# --- step-level equivalence ---------------------------------------------

def test_train_step_packed_equals_f32(np_rng):
    from contrastyou_tpu.engine import ModelBundle, init_train_state
    from contrastyou_tpu.engine.optim import create_optimizer
    from contrastyou_tpu.engine.steps import build_train_step
    from contrastyou_tpu.hooks import ConsistencyTrainerHook
    from contrastyou_tpu.models import UNet

    B, H = 4, 32
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))
    hooks = [ConsistencyTrainerHook(weight=0.5)]
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=1, steps_per_epoch=1)
    step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                            mode="semi")

    from contrastyou_tpu.data.wire import normalize_u8
    img_l = np_rng.integers(0, 256, (B, H, H, 1)).astype(np.uint8)
    img_u = np_rng.integers(0, 256, (B, H, H, 1)).astype(np.uint8)
    tgt = np_rng.integers(0, 4, (B, H, H)).astype(np.int32)
    f32_batch = {
        "labeled_image": jnp.asarray(normalize_u8(img_l)),
        "labeled_target": jnp.asarray(tgt),
        "unlabeled_image": jnp.asarray(normalize_u8(img_u)),
        "unlabeled_partition": jnp.zeros((B,), jnp.int32),
        "unlabeled_scan_id": jnp.zeros((B,), jnp.int32),
        "unlabeled_patient": jnp.zeros((B,), jnp.int32),
        "unlabeled_cycle": jnp.zeros((B,), jnp.int32),
    }
    packed_batch = {k: jnp.asarray(pack_array(np.asarray(v)))
                    for k, v in f32_batch.items()}
    assert packed_batch["labeled_image"].dtype == jnp.uint8
    assert packed_batch["labeled_target"].dtype == jnp.uint8

    rng_s, epoch = jax.random.PRNGKey(7), jnp.int32(0)
    s0 = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    snap = jax.tree.map(jnp.array, s0)
    s1, m1 = step(s0, f32_batch, rng_s, epoch)
    s2, m2 = step(snap, packed_batch, rng_s, epoch)
    # the TRAJECTORY is bitwise identical (params, stats, opt state); the
    # reported loss scalar may differ by ~1 ulp — metric reductions fuse
    # differently across the two programs and reduction order is not
    # contractual in XLA
    np.testing.assert_allclose(np.asarray(m1["total_loss"]),
                               np.asarray(m2["total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves((s1.params, s1.batch_stats,
                                     s1.opt_state)),
                    jax.tree.leaves((s2.params, s2.batch_stats,
                                     s2.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_cache_u8_staging_matches_f32(tmp_path, monkeypatch):
    from contrastyou_tpu.augment import RandomCrop
    from contrastyou_tpu.data import ACDCDataset, synthesize_acdc_like
    from contrastyou_tpu.data.device_cache import DeviceDataCache

    synthesize_acdc_like(tmp_path, num_train_scans=2, num_val_scans=1,
                         slices_per_scan=4, size=48)
    ds = ACDCDataset(root_dir=str(tmp_path), mode="train",
                     transforms=RandomCrop(32))
    cache_u8 = DeviceDataCache.from_dataset(ds, crop=32)
    assert cache_u8._images.dtype == jnp.uint8
    monkeypatch.setenv("CONTRASTYOU_WIRE_U8", "0")
    cache_f32 = DeviceDataCache.from_dataset(ds, crop=32)
    assert cache_f32._images.dtype == jnp.float32
    monkeypatch.delenv("CONTRASTYOU_WIRE_U8")
    key = jax.random.PRNGKey(5)
    b_u8 = cache_u8.sample(key, 4)
    b_f32 = cache_f32.sample(key, 4)
    assert b_u8["image"].dtype == jnp.float32
    for k in b_f32:
        np.testing.assert_array_equal(np.asarray(b_u8[k]),
                                      np.asarray(b_f32[k]))


# --- DevicePrefetcher ----------------------------------------------------

def test_prefetcher_preserves_order_and_values():
    items = list(range(57))
    out = list(DevicePrefetcher(iter(items), depth=3))
    assert out == items


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("loader died")

    it = iter(DevicePrefetcher(gen(), depth=2))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)


def test_prefetcher_runs_ahead():
    """With depth 2 the producer materialises items before they're asked
    for — the overlap property the tunnel transfer relies on."""
    produced = []
    consumed = threading.Event()

    def gen():
        for i in range(5):
            produced.append(i)
            yield i

    it = iter(DevicePrefetcher(gen(), depth=2))
    first = next(it)
    assert first == 0
    # give the worker a moment: it should have buffered ahead
    for _ in range(100):
        if len(produced) >= 3:
            break
        threading.Event().wait(0.01)
    assert len(produced) >= 3
    assert list(it) == [1, 2, 3, 4]


def test_prefetch_depth_knob(monkeypatch):
    monkeypatch.setenv("CONTRASTYOU_DEVICE_PREFETCH", "5")
    assert prefetch_depth() == 5
    monkeypatch.setenv("CONTRASTYOU_DEVICE_PREFETCH", "0")
    assert prefetch_depth() == 0
