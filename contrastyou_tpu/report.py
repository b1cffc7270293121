"""Result aggregation CLI: walk run directories, collect selected columns from
their storage.csv files, rank by an anchor column, and merge into one summary
table (capability match for contrastyou/report.py:14-163 and the
``report`` console script)."""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import List

import pandas as pd


def find_csvs(top_folder: str | None, specific_folders: List[str] | None,
              patterns: List[str]) -> List[Path]:
    roots = [Path(top_folder)] if top_folder else [Path(p) for p in specific_folders]
    out: List[Path] = []
    for root in roots:
        for pattern in patterns:
            out.extend(sorted(root.rglob(pattern)))
    return out


def summarize_run(csv_path: Path, classes: List[str], anchor: str,
                  high_better: bool = True) -> dict | None:
    try:
        df = pd.read_csv(csv_path, index_col=0)
    except Exception:
        return None
    cols = [c for c in df.columns if any(cls in c for cls in classes)]
    anchor_cols = [c for c in cols if anchor in c]
    if not anchor_cols:
        return None
    anchor_col = anchor_cols[0]
    series = df[anchor_col].dropna()
    if series.empty:
        return None
    best_epoch = series.idxmax() if high_better else series.idxmin()
    row = {"folder": str(csv_path.parent), "best_epoch": best_epoch}
    for c in cols:
        row[c] = df.loc[best_epoch, c]
    return row


def main(argv=None) -> pd.DataFrame:
    parser = argparse.ArgumentParser(description="aggregate run storage.csv files")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--specific_folders", "-s", nargs="+", metavar="PATH")
    group.add_argument("--top_folder", "-t", metavar="PATH")
    parser.add_argument("--classes", nargs="+", required=True,
                        help="column substrings to collect (e.g. DSC_mean)")
    parser.add_argument("--anchor", default=None,
                        help="column substring used to pick the best epoch")
    parser.add_argument("--file", nargs="+", default=["storage.csv"])
    parser.add_argument("--high_better", type=lambda s: s.lower() != "false",
                        default=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--save_filename", default="summary.csv")
    args = parser.parse_args(argv)
    anchor = args.anchor or args.classes[0]

    csvs = find_csvs(args.top_folder, args.specific_folders, args.file)
    rows = [r for r in (summarize_run(p, args.classes, anchor,
                                      args.high_better) for p in csvs)
            if r is not None]
    summary = pd.DataFrame(rows)
    Path(args.save_dir).mkdir(parents=True, exist_ok=True)
    out = Path(args.save_dir) / args.save_filename
    summary.to_csv(out, index=False)
    print(f"wrote {len(summary)} runs -> {out}")
    return summary


if __name__ == "__main__":
    main()
