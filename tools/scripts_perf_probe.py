"""Perf probe: honest per-step cost + unroll sweep with FRESH in-graph batches.

Round-1 bench reused one pre-staged batch per call; the axon tunnel can serve
repeated identical work abnormally fast (measured: an 8192^3 matmul "ran" at
29 PFLOP/s on repeat calls — impossible), so those numbers are suspect.
This probe samples a fresh batch in-graph every step (DeviceDataCache), so
every dispatch is genuinely new work, and anchors MFU with XLA's own cost
analysis of the compiled program.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import BATCH_LABELED, BATCH_UNLABELED, SIZE, _build, _synthetic_split
from contrastyou_tpu.data.device_cache import DeviceDataCache
from contrastyou_tpu.engine.steps import build_cached_train_step

UNROLLS = [int(x) for x in os.environ.get("PROBE_UNROLLS", "1,2,4,8").split(",")]


def main():
    labeled, unlabeled = _synthetic_split()
    lab_cache = DeviceDataCache.from_dataset(labeled, crop=SIZE)
    unlab_cache = DeviceDataCache.from_dataset(unlabeled, crop=SIZE)

    for unroll in UNROLLS:
        bundle, hooks, optimizer, state = _build()
        step = build_cached_train_step(
            bundle, optimizer, hooks, labeled_cache=lab_cache,
            unlabeled_cache=unlab_cache, labeled_batch=BATCH_LABELED,
            unlabeled_batch=BATCH_UNLABELED, unroll=unroll,
            two_stage=True, mode="semi")
        epoch = jnp.int32(0)
        # cost analysis of the compiled program
        lowered = step.lower(state, jax.random.PRNGKey(0), epoch)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        flops = float(cost.get("flops", float("nan")))

        k = iter(range(10 ** 9))
        for _ in range(2):
            state, _ = step(state, jax.random.PRNGKey(next(k)), epoch)
        jax.block_until_ready(jax.tree.leaves(state.params)[0])
        n_calls = max(24 // unroll, 4)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, _ = step(state, jax.random.PRNGKey(next(k)), epoch)
        jax.block_until_ready(jax.tree.leaves(state.params)[0])
        dt = time.perf_counter() - t0
        steps_s = n_calls * unroll / dt
        tflops = flops * n_calls / dt / 1e12
        print(json.dumps({
            "unroll": unroll,
            "ms_per_call": round(dt / n_calls * 1e3, 2),
            "steps_per_sec": round(steps_s, 1),
            "slices_per_sec": round(steps_s * (BATCH_LABELED + BATCH_UNLABELED), 1),
            "program_tflop": round(flops / 1e12, 3),
            "sustained_tflops": round(tflops, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
