#!/usr/bin/env python
"""Categorized attribution of a jax.profiler trace (device ops lane).

Usage: python tools/trace_cat.py <trace_dir> [steps_per_trace] [--by=scope|cat]

Filters to the TPU device pid's "XLA Ops" thread, drops control-flow
wrapper ops (hlo_category "while"/"conditional" span their whole body and
double-count everything inside), and buckets op self-time by

- ``cat``:   the compiler's hlo_category (convolution fusion, loop fusion,
             copy, custom-call, ...)
- ``scope``: the jit scope path from ``tf_op`` — collapsed to the deepest
             named model/hook component (DenseProjectionHead, Conv1, ...,
             transpose(...) marks backward), which attributes generic
             ``fusion.NNNN`` names to their source subsystem.

Durations are divided by steps_per_trace (default 4 — the perf scripts'
INNER) to print ms/step.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys


def load_ops(trace_dir: str):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise SystemExit(f"no trace under {trace_dir}")
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    device_pids = {e["pid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e["args"].get("name", ""))}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    ops = []
    for e in ev:
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        if e["pid"] not in device_pids:
            continue
        if tid_names.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        cat = e.get("args", {}).get("hlo_category", "?")
        if cat in ("while", "conditional", "call"):
            continue  # wrapper spans its body: double-counts
        ops.append(e)
    return ops


_SCOPE_HINTS = (
    # ordered: first match wins. Model/hook scope names as they appear in
    # tf_op jit paths.
    "DenseProjectionHead", "ProjectionHead", "DenseClusterHead",
    "ClusterHead", "_SubHead",
    "Conv1", "Conv2", "Conv3", "Conv4", "Conv5",
    "Up_conv5", "Up_conv4", "Up_conv3", "Up_conv2", "Up5", "Up4", "Up3",
    "Up2", "Deconv_1x1",
    "iic", "infonce", "sup_con", "warp", "affine", "radam", "adam",
    "scale_by", "optimizer",
)


def scope_of(e) -> str:
    tf_op = e.get("args", {}).get("tf_op", "")
    bwd = "transpose(" in tf_op or "/vjp" in tf_op
    for hint in _SCOPE_HINTS:
        if hint in tf_op:
            return f"{hint}{'[bwd]' if bwd else ''}"
    name = e.get("name", "?")
    base = re.sub(r"[.\d]+$", "", name)
    if base in ("copy", "copy-done", "copy-start", "bitcast"):
        return "copies"
    cat = e.get("args", {}).get("hlo_category", "?")
    return f"<{cat}>{'[bwd]' if bwd else ''}"


def main():
    trace_dir = sys.argv[1]
    steps = float(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 4.0
    by = "scope"
    for a in sys.argv[2:]:
        if a.startswith("--by="):
            by = a.split("=", 1)[1]
    ops = load_ops(trace_dir)
    total = sum(e["dur"] for e in ops)
    buckets: dict[str, float] = {}
    counts: dict[str, int] = {}
    for e in ops:
        key = scope_of(e) if by == "scope" else e["args"].get("hlo_category", "?")
        buckets[key] = buckets.get(key, 0.0) + e["dur"]
        counts[key] = counts.get(key, 0) + 1
    print(f"device op-time: {total / 1e3 / steps:.2f} ms/step "
          f"({len(ops)} events, /{steps:g} steps)")
    for key, dur in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{dur / 1e3 / steps:9.2f} ms {100 * dur / total:5.1f}% "
              f"{counts[key]:6d}x  {key}")


if __name__ == "__main__":
    main()
