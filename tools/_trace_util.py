"""Shared profiler-trace helper for the on-chip perf scripts: capture a
trace of a chained step fn and print the top TPU ops by summed duration."""
import glob
import gzip
import json
import os

import jax


def trace_chain(chain, st, out_dir, top: int = 45):
    # Attribute ONLY the trace written by THIS capture: the scripts reuse
    # one CONTRASTYOU_TRACE_DIR across variants/runs, and lexicographic
    # order over everything ever written there is only incidentally
    # chronological (advisor r4) — snapshot first, pick the newest new file.
    before = set(glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True))
    st = chain(st)
    float(st[1])
    jax.profiler.start_trace(out_dir)
    st = chain(st)
    float(st[1])
    jax.profiler.stop_trace()
    files = [f for f in glob.glob(f"{out_dir}/**/*.trace.json.gz",
                                  recursive=True) if f not in before]
    files.sort(key=os.path.getmtime)
    if not files:
        print("no trace captured in", out_dir)
        return st
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    events = [e for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    by_name: dict[str, float] = {}
    for e in events:
        name = e.get("name", "?")
        by_name[name] = by_name.get(name, 0.0) + e["dur"]
    total = sum(by_name.values())
    print(f"total traced op-time: {total / 1e3:.1f} ms "
          f"across {len(events)} events")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 1e3:10.2f} ms {100 * dur / total:5.1f}%  {name[:110]}")
    return st
