"""Benchmark: ACDC-scale semi-supervised training throughput (slices/sec/chip).

Replicates the reference's default training configuration
(config/base.yaml:24-42: batch 5 labeled + 5 unlabeled 224x224 slices,
max_channel=512 UNet, consistency-style regularization, AMP<->bf16) and
measures steady-state slices/sec on one chip over THREE input paths:

- ``cached``  (HEADLINE, end-to-end): the production device-resident path —
  the synthetic ACDC split is staged into HBM once and every batch is sampled
  + cropped in-graph (data/device_cache.py + build_cached_train_step). This
  includes ALL per-step data work; the host sends one rng key per dispatch.
- ``hostfed`` (end-to-end): the host loader path — RAM-preloaded dataset,
  native C++ crop/normalize/collate, K-stacked host batches per dispatch —
  the path a disk-scale dataset would use, and the closest analogue of the
  reference's DataLoader loop (semi_seg/epochers/epocher.py:269-295).
- ``device``  (upper bound): one pre-staged batch reused every step — no
  input cost at all; isolates the compiled step itself.

All three use the same unroll=8 train program (eight optimizer steps per XLA
dispatch; identical math to sequential stepping, tests/test_chunked_steps.py).

Baseline: the reference repo publishes no numbers (BASELINE.md);
A100_SLICES_PER_SEC is the documented estimate of the reference's single-A100
throughput at this configuration; vs_baseline = headline / estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...aux}.
CONTRASTYOU_BENCH_MODE=cached|hostfed|device|all (default all) selects paths.
"""
from __future__ import annotations

import json
import os
import tempfile
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Reference single-A100 throughput estimate, derived in BASELINE_MEASURED.md
# (round 3): measured 1.148 TFLOP/step x A100 tf32 peak 156 TFLOP/s x the
# 15-25% MFU band realistic for the reference's sync-per-batch epocher
# (loss.item() + meters each batch, PIL input pipeline, AMP casts) ->
# 205-340 slices/s; 250 = band middle. The pure-conv best case (45% MFU,
# 610 slices/s) is reported there too so vs_baseline is interpretable.
# Slices/sec = (5 labeled + 5 unlabeled) * steps/sec.
A100_SLICES_PER_SEC = 250.0

# CONTRASTYOU_BENCH_BATCH = total slices/step (split evenly labeled/
# unlabeled); default 10 = the reference config. The batch-scaling table
# (VERDICT r4 #5) runs 10/32/64 through this knob with identical semantics.
_TOTAL_BATCH = int(os.environ.get("CONTRASTYOU_BENCH_BATCH", "10"))
BATCH_LABELED = _TOTAL_BATCH // 2
BATCH_UNLABELED = _TOTAL_BATCH - _TOTAL_BATCH // 2
SIZE = 224
RAW_SIZE = 256
UNROLL = int(os.environ.get("CONTRASTYOU_BENCH_UNROLL", "8"))
WARMUP_CALLS = 3
MEASURE_CALLS = max(200 // UNROLL, 20)
# default = all three paths, so every BENCH_r*.json records cached (the
# headline) + hostfed + device as aux fields (VERDICT r4 #6). The sweep
# compiles three distinct programs, but the persistent XLA compile cache
# (contrastyou_tpu.perf.enable_compile_cache) makes repeat runs minutes,
# not tens of minutes; CONTRASTYOU_BENCH_MODE=cached selects one path.
MODE = os.environ.get("CONTRASTYOU_BENCH_MODE", "all")


def _build(model_dtype=jnp.bfloat16):
    from contrastyou_tpu.engine import ModelBundle, init_train_state
    from contrastyou_tpu.engine.optim import create_optimizer
    from contrastyou_tpu.hooks import ConsistencyTrainerHook
    from contrastyou_tpu.models import UNet

    model = UNet(input_dim=1, num_classes=4, max_channel=512,
                 dtype=model_dtype)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (SIZE, SIZE, 1))
    hooks = [ConsistencyTrainerHook(weight=1.0)]
    optimizer, _ = create_optimizer(
        {"name": "radam", "lr": 1e-7, "weight_decay": 1e-5},
        {"multiplier": 300, "warmup_max": 10},
        max_epoch=75, steps_per_epoch=200)
    state = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    return bundle, hooks, optimizer, state


def _sync(state) -> float:
    """Force REAL completion: a device reduction over the updated params plus
    a host CONTENT read. This backend's block_until_ready can return before
    device execution of some dispatch chains finishes (BENCH_NOTES timing
    trap; the hostfed path once 'measured' 5x above the device-only bound) —
    but a value read cannot lie."""
    leaf = jax.tree.leaves(state.params)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _timed(fn, n_calls: int, state):
    for _ in range(WARMUP_CALLS):
        state = fn(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state = fn(state)
    # content-read the UPDATED PARAMS of the final call: via the state
    # dependency chain this forces every step to have really executed
    _sync(state)
    dt = time.perf_counter() - t0
    return n_calls * UNROLL * (BATCH_LABELED + BATCH_UNLABELED) / dt


def _synthetic_split():
    """Synthetic ACDC at the reference scale: ~174 train scans is the real
    dataset; 24 scans x 10 slices here keeps staging quick while being far
    larger than one batch."""
    from contrastyou_tpu.augment import RandomCrop
    from contrastyou_tpu.data import (ACDCDataset, split_dataset,
                                      synthesize_acdc_like)
    tmp = tempfile.mkdtemp(prefix="bench_data_")
    synthesize_acdc_like(tmp, num_train_scans=24, num_val_scans=2,
                         slices_per_scan=10, size=RAW_SIZE)
    tra = ACDCDataset(root_dir=tmp, mode="train",
                      transforms=RandomCrop(SIZE))
    labeled, unlabeled, *_ = split_dataset(tra, 4, seed=1)
    return labeled, unlabeled


def bench_cached(bundle, hooks, optimizer, state):
    from contrastyou_tpu.data.device_cache import DeviceDataCache
    from contrastyou_tpu.engine.steps import build_cached_train_step
    labeled, unlabeled = _synthetic_split()
    lab_cache = DeviceDataCache.from_dataset(labeled, crop=SIZE)
    unlab_cache = DeviceDataCache.from_dataset(unlabeled, crop=SIZE)
    step = build_cached_train_step(
        bundle, optimizer, hooks, labeled_cache=lab_cache,
        unlabeled_cache=unlab_cache, labeled_batch=BATCH_LABELED,
        unlabeled_batch=BATCH_UNLABELED, unroll=UNROLL,
        two_stage=True, mode="semi")
    epoch = jnp.int32(0)
    counter = iter(range(10 ** 9))

    def call(s):
        s, _ = step(s, jax.random.PRNGKey(next(counter)), epoch)
        return s

    return _timed(call, MEASURE_CALLS, state)


def bench_hostfed(bundle, hooks, optimizer, state):
    from contrastyou_tpu.data import BatchLoader, InfiniteRandomSampler
    from contrastyou_tpu.engine.steps import (build_unrolled_train_step,
                                              stack_batches)
    labeled, unlabeled = _synthetic_split()
    labeled.preload()
    unlabeled.preload()
    lab = BatchLoader(labeled,
                      sampler=InfiniteRandomSampler(len(labeled), seed=0),
                      batch_size=BATCH_LABELED)
    unlab = BatchLoader(unlabeled,
                        sampler=InfiniteRandomSampler(len(unlabeled), seed=0),
                        batch_size=BATCH_UNLABELED)
    step = build_unrolled_train_step(bundle, optimizer, hooks, unroll=UNROLL,
                                     two_stage=True, mode="semi")
    lab_it, unlab_it = iter(lab), iter(unlab)
    epoch = jnp.int32(0)
    counter = iter(range(10 ** 9))

    # same input machinery as the trainer (data/wire.py): u8 wire packing
    # + a device-prefetch thread that overlaps the tunnel transfer with the
    # running step (VERDICT r3 #7)
    from contrastyou_tpu.data.wire import (DevicePrefetcher, pack_array,
                                           prefetch_depth)

    def produce():
        while True:
            batches = []
            for _ in range(UNROLL):
                lb, ub = next(lab_it), next(unlab_it)
                batches.append({
                    "labeled_image": jnp.asarray(pack_array(lb["image"])),
                    "labeled_target": jnp.asarray(pack_array(lb["target"])),
                    "unlabeled_image": jnp.asarray(pack_array(ub["image"])),
                    "unlabeled_partition": jnp.asarray(ub["partition"]),
                    "unlabeled_scan_id": jnp.asarray(ub["scan_id"]),
                    "unlabeled_patient": jnp.asarray(ub["patient"]),
                    "unlabeled_cycle": jnp.asarray(ub["cycle"]),
                })
            yield stack_batches(batches)

    depth = prefetch_depth()
    feed = iter(DevicePrefetcher(produce(), depth=depth)
                if depth else produce())

    def call(s):
        rngs = jax.random.split(jax.random.PRNGKey(next(counter)), UNROLL)
        s, _ = step(s, next(feed), rngs, epoch)
        return s

    return _timed(call, max(MEASURE_CALLS // 2, 5), state)


def bench_device(bundle, hooks, optimizer, state):
    """Upper bound: batches are generated IN-GRAPH from the per-call key —
    fresh contents every step with zero host input cost. (The earlier
    pre-staged-and-reused batch variant is the exact dispatch shape this
    backend mis-times by orders of magnitude — see BENCH_NOTES.md.)"""
    from contrastyou_tpu.engine.steps import (build_unrolled_train_step,
                                              stack_batches)
    inner = build_unrolled_train_step(bundle, optimizer, hooks, unroll=UNROLL,
                                      two_stage=True, mode="semi")
    epoch = jnp.int32(0)

    @partial(jax.jit, donate_argnums=0)
    def step(s, key):
        ks = jax.random.split(key, 3)
        rngs = jax.random.split(ks[2], UNROLL)
        batch = stack_batches([{
            "labeled_image": jax.random.uniform(
                jax.random.fold_in(ks[0], k),
                (BATCH_LABELED, SIZE, SIZE, 1)),
            "labeled_target": jax.random.randint(
                jax.random.fold_in(ks[1], k),
                (BATCH_LABELED, SIZE, SIZE), 0, 4),
            "unlabeled_image": jax.random.uniform(
                jax.random.fold_in(ks[0], UNROLL + k),
                (BATCH_UNLABELED, SIZE, SIZE, 1)),
            "unlabeled_partition": jnp.zeros((BATCH_UNLABELED,), jnp.int32),
            "unlabeled_scan_id": jnp.zeros((BATCH_UNLABELED,), jnp.int32),
            "unlabeled_patient": jnp.zeros((BATCH_UNLABELED,), jnp.int32),
            "unlabeled_cycle": jnp.zeros((BATCH_UNLABELED,), jnp.int32),
        } for k in range(UNROLL)])
        s, _ = inner(s, batch, rngs, epoch)
        return s

    counter = iter(range(10 ** 9))

    def call(s):
        return step(s, jax.random.PRNGKey(next(counter)))

    return _timed(call, MEASURE_CALLS, state)


def main() -> None:
    results = {}
    errors = {}
    runs = {"cached": bench_cached, "hostfed": bench_hostfed,
            "device": bench_device}
    wanted = runs if MODE == "all" else {MODE: runs[MODE]}
    for name, fn in wanted.items():
        # one mode dying (the remote-compile tunnel throws transient
        # INTERNAL errors under load) must not lose the whole sweep —
        # record what succeeded and flag the rest
        try:
            bundle, hooks, optimizer, state = _build()
            results[name] = round(fn(bundle, hooks, optimizer, state), 2)
        except Exception as exc:  # pragma: no cover - transient backend
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    if not results:
        raise SystemExit(f"all bench modes failed: {errors}")
    headline = results.get("cached") or next(iter(results.values()))
    out = {
        "metric": "acdc_semi_train_slices_per_sec_per_chip_e2e",
        "value": headline,
        "unit": "slices/sec/chip",
        "vs_baseline": round(headline / A100_SLICES_PER_SEC, 3),
    }
    for name, v in results.items():
        out[f"aux_{name}"] = v
    for name, err in errors.items():
        out[f"aux_{name}_error"] = err
    print(json.dumps(out))


if __name__ == "__main__":
    main()
