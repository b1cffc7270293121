"""Capture a jax.profiler trace of the real train step and print the top TPU
ops by self-time (parsed from the xplane proto via tensorboard_plugin_profile).
"""
import glob
import gzip
import json
import os
import sys
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import BATCH_LABELED, BATCH_UNLABELED, SIZE, _build, _synthetic_split
from contrastyou_tpu.data.device_cache import DeviceDataCache
from contrastyou_tpu.engine.steps import build_cached_train_step

OUT = os.environ.get("TRACE_DIR", "/tmp/step_trace")


def capture():
    labeled, unlabeled = _synthetic_split()
    lab_cache = DeviceDataCache.from_dataset(labeled, crop=SIZE)
    unlab_cache = DeviceDataCache.from_dataset(unlabeled, crop=SIZE)
    bundle, hooks, optimizer, state = _build()
    step = build_cached_train_step(
        bundle, optimizer, hooks, labeled_cache=lab_cache,
        unlabeled_cache=unlab_cache, labeled_batch=BATCH_LABELED,
        unlabeled_batch=BATCH_UNLABELED, unroll=1, two_stage=True,
        mode="semi")
    epoch = jnp.int32(0)
    k = iter(range(10 ** 9))
    for _ in range(3):
        state, _ = step(state, jax.random.PRNGKey(next(k)), epoch)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    jax.profiler.start_trace(OUT)
    for _ in range(5):
        state, _ = step(state, jax.random.PRNGKey(next(k)), epoch)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    jax.profiler.stop_trace()
    print("trace captured ->", OUT)


def analyze():
    files = glob.glob(f"{OUT}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz found; files:",
              glob.glob(f"{OUT}/**/*", recursive=True)[-10:])
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # keep device-lane events (TPU op activity), drop python/host threads
    by_name: dict[str, float] = {}
    for e in events:
        name = e.get("name", "?")
        by_name[name] = by_name.get(name, 0.0) + e["dur"]
    total = sum(by_name.values())
    print(f"total traced op-time: {total/1e3:.1f} ms across {len(events)} events")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3:10.2f} ms  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    if "analyze" not in sys.argv:
        capture()
    analyze()
