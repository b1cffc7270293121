"""Clean up failed experiment runs under a sweep root.

Capability match for the reference's script/delete_failed_runs.py:11-40: an
experiment directory is any directory containing a dumped ``config.yaml``; a
run succeeded iff its ``.success`` marker exists (written by the Trainer on
completion, engine/trainer.py). Failed runs get their csv artifacts removed
(default) or the whole run directory deleted (``--delete-dir``).

Usage:
  python script/delete_failed_runs.py runs/sweep [--delete-dir] [--dry-run]
"""
from __future__ import annotations

import argparse
import shutil
from pathlib import Path


def find_experiments(root: Path) -> list[Path]:
    return sorted({p.parent for p in root.rglob("config.yaml")})


def is_succeeded(run_dir: Path) -> bool:
    return (run_dir / ".success").exists()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("root", type=str)
    parser.add_argument("--delete-dir", action="store_true",
                        help="remove the whole failed run directory "
                             "(default: only its csv files)")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    root = Path(args.root)
    assert root.is_dir(), root
    experiments = find_experiments(root)
    failed = [e for e in experiments if not is_succeeded(e)]
    print(f"Found {len(experiments)} experiments, {len(failed)} failed.")
    for run in failed:
        if args.delete_dir:
            print(f"rm -r {run}")
            if not args.dry_run:
                shutil.rmtree(run)
        else:
            for csv in run.glob("*.csv"):
                print(f"rm {csv}")
                if not args.dry_run:
                    csv.unlink()


if __name__ == "__main__":
    main()
