"""Benchmark: ACDC-scale semi-supervised training throughput (slices/sec/chip).

Replicates the reference's default training configuration
(config/base.yaml:24-42: batch 5 labeled + 5 unlabeled 224x224 slices,
max_channel=512 UNet, consistency-style regularization, AMP<->bf16) as the
jitted TPU train step and measures steady-state slices/sec on one chip.

The measured path is the production trainer path with ``unroll_steps=8``
(engine/steps.py build_unrolled_train_step): eight optimizer steps per XLA
dispatch, each on its own batch — identical math to sequential stepping
(tests/test_chunked_steps.py), amortizing the launch round-trip that
dominates at the reference batch size. Set CONTRASTYOU_BENCH_UNROLL=1 to
measure per-step dispatch instead.

Baseline: the reference repo publishes no numbers (BASELINE.md); the
comparison anchor is the driver north-star "5x A100". A100_SLICES_PER_SEC
below is the documented estimate of the reference's single-A100 throughput at
this exact configuration; vs_baseline = measured / A100_SLICES_PER_SEC.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Estimated reference throughput: single-GPU PyTorch epocher at batch 5+5,
# 224^2, UNet-512 with per-batch python hook dispatch and .item() syncs
# (SURVEY.md §6). Slices/sec = (5 labeled + 5 unlabeled) * steps/sec.
A100_SLICES_PER_SEC = 250.0

BATCH_LABELED = 5
BATCH_UNLABELED = 5
SIZE = 224
UNROLL = int(os.environ.get("CONTRASTYOU_BENCH_UNROLL", "8"))
WARMUP_CALLS = 3
MEASURE_CALLS = max(200 // UNROLL, 20)


def main() -> None:
    from contrastyou_tpu.engine import ModelBundle, init_train_state
    from contrastyou_tpu.engine.optim import create_optimizer
    from contrastyou_tpu.engine.steps import (build_train_step,
                                              build_unrolled_train_step,
                                              stack_batches)
    from contrastyou_tpu.hooks import ConsistencyTrainerHook
    from contrastyou_tpu.models import UNet

    model = UNet(input_dim=1, num_classes=4, max_channel=512,
                 dtype=jnp.bfloat16)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (SIZE, SIZE, 1))
    hooks = [ConsistencyTrainerHook(weight=1.0)]
    optimizer, _ = create_optimizer(
        {"name": "radam", "lr": 1e-7, "weight_decay": 1e-5},
        {"multiplier": 300, "warmup_max": 10},
        max_epoch=75, steps_per_epoch=200)
    state = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    if UNROLL > 1:
        step = build_unrolled_train_step(bundle, optimizer, hooks,
                                         unroll=UNROLL, two_stage=True,
                                         mode="semi")
    else:
        step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                                mode="semi")

    rng = np.random.default_rng(0)

    def mkbatch():
        return {
            "labeled_image": jnp.asarray(
                rng.random((BATCH_LABELED, SIZE, SIZE, 1), np.float32)),
            "labeled_target": jnp.asarray(
                rng.integers(0, 4, (BATCH_LABELED, SIZE, SIZE)), jnp.int32),
            "unlabeled_image": jnp.asarray(
                rng.random((BATCH_UNLABELED, SIZE, SIZE, 1), np.float32)),
            "unlabeled_partition": jnp.zeros((BATCH_UNLABELED,), jnp.int32),
            "unlabeled_scan_id": jnp.zeros((BATCH_UNLABELED,), jnp.int32),
            "unlabeled_patient": jnp.zeros((BATCH_UNLABELED,), jnp.int32),
            "unlabeled_cycle": jnp.zeros((BATCH_UNLABELED,), jnp.int32),
        }

    key = jax.random.PRNGKey(2)
    epoch = jnp.int32(0)
    if UNROLL > 1:
        batch = stack_batches([mkbatch() for _ in range(UNROLL)])
        rngs = jax.random.split(key, UNROLL)
        args = (batch, rngs, epoch)
    else:
        args = (mkbatch(), key, epoch)

    for _ in range(WARMUP_CALLS):
        state, metrics = step(state, *args)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])

    t0 = time.perf_counter()
    for _ in range(MEASURE_CALLS):
        state, metrics = step(state, *args)
    # block on the UPDATED PARAMS of the final call: via the state dependency
    # chain this forces every step's full forward+backward+update to complete
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    dt = time.perf_counter() - t0

    steps_per_sec = MEASURE_CALLS * UNROLL / dt
    slices_per_sec = steps_per_sec * (BATCH_LABELED + BATCH_UNLABELED)
    print(json.dumps({
        "metric": "acdc_semi_train_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_sec / A100_SLICES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
