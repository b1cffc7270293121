"""Batch-scaling table (VERDICT r4 #5): slices/s + MFU at total batch
10 (the reference config) / 32 / 64, identical semantics knobs — shows
whether the step is launch/glue-bound or compute-bound and what a
throughput-oriented user gets beyond the reference batch.

Runs bench.py's cached headline path in a subprocess per batch size
(CONTRASTYOU_BENCH_BATCH) and prints the table for BENCH_NOTES. MFU uses
the floor-analysis FLOP count (tools/floor_analysis.py: 1.126 TFLOP per
15-image fwd+bwd at 224², scaling linearly with batch) against the v5e's
197 TFLOP/s bf16 peak.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PEAK = 197e12
TFLOP_PER_10_SLICES = 1.126e12


def run(batch: int) -> dict:
    env = dict(os.environ, CONTRASTYOU_BENCH_BATCH=str(batch),
               CONTRASTYOU_BENCH_MODE="cached")
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, env=env, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [10, 32, 64]
    print(f"{'batch':>6} {'slices/s':>10} {'ms/step':>9} {'MFU':>6}")
    for b in batches:
        r = run(b)
        sps = r["value"]
        ms = b / sps * 1e3
        mfu = (TFLOP_PER_10_SLICES * b / 10) / (ms / 1e3) / PEAK
        print(f"{b:>6} {sps:>10.1f} {ms:>9.2f} {mfu:>6.1%}")


if __name__ == "__main__":
    main()
