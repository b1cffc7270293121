#!/usr/bin/env python
"""Turnkey ingest for a REAL dataset archive (VERDICT r4 #7).

This environment has no network egress, so the reference's download path
(``/root/reference/contrastyou/data/dataset/_ioutils.py:1-191``:
gdown -> md5 -> extract) has never moved a real pixel here.  This tool is
the local half of that pipeline: given an archive that IS present, it

1. md5-verifies it (``--md5``; the reference itself downloads with
   ``md5=None`` — no published checksums — so the default just records the
   digest for the run log),
2. extracts it into the data root exactly like the reference's
   ``extract_archive`` (_ioutils.py:108-138: zip / tar / tar.gz / tgz),
3. validates the extracted tree against the framework's layout expectations
   (folder name, mode sub-folders, img/gt stem pairing, ``*_info.npy``
   per-scan slice counts vs what is actually on disk), and
4. optionally runs the CLI training smoke on it (``--smoke``).

Usage:
    python tools/ingest_real.py --archive /path/ACDC_contrast.zip \
        --data-name acdc [--root $CONTRASTYOU_DATA_PATH] [--md5 HEX] [--smoke]

Exit code 0 = archive ingested and validated; the matching auto-skip test
is tests/test_ingest_real.py (set CONTRASTYOU_REAL_ARCHIVE +
CONTRASTYOU_REAL_DATA_NAME to un-skip it the day real data exists).
"""
from __future__ import annotations

import argparse
import hashlib
import os
import subprocess
import sys
import tarfile
import zipfile
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))


def md5_file(path: str | Path, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(chunk), b""):
            h.update(block)
    return h.hexdigest()


def extract_archive(archive: str | Path, to_dir: str | Path) -> None:
    """Same format support as the reference downloader
    (_ioutils.py:108-138)."""
    archive = str(archive)
    os.makedirs(to_dir, exist_ok=True)
    if archive.endswith(".zip"):
        with zipfile.ZipFile(archive, "r") as z:
            z.extractall(to_dir)
    elif archive.endswith((".tar.gz", ".tgz")):
        with tarfile.open(archive, "r:gz") as t:
            t.extractall(to_dir)
    elif archive.endswith(".tar.xz"):
        with tarfile.open(archive, "r:xz") as t:
            t.extractall(to_dir)
    elif archive.endswith(".tar"):
        with tarfile.open(archive, "r") as t:
            t.extractall(to_dir)
    else:
        raise ValueError(f"unsupported archive format: {archive}")


def validate(root: str | Path, data_name: str) -> dict:
    """Instantiate the real dataset classes over the extracted tree and
    cross-check every layer of metadata; returns a summary dict."""
    from contrastyou_tpu.data.datasets import data_zoo, dataset_spec

    cls = data_zoo[data_name]
    spec = dataset_spec(data_name)
    folder = Path(root) / spec["folder_name"]
    if not folder.is_dir():
        found = sorted(p.name for p in Path(root).iterdir())
        raise FileNotFoundError(
            f"expected {folder} after extraction; found {found}")

    summary: dict = {"folder": str(folder)}
    for mode in ("train", "val"):
        ds = cls(root_dir=str(root), mode=mode)
        stems = ds.get_stem_list()
        if not stems:
            raise RuntimeError(f"{data_name}/{mode}: no slices found")
        scans = ds.get_scan_list()
        counts = ds._count_slices_per_scan()
        # every stem must resolve through every sub-folder (img/gt pairing)
        mem = ds.get_memory_dictionary()
        lens = {k: len(v) for k, v in mem.items()}
        if len(set(lens.values())) != 1:
            raise RuntimeError(
                f"{data_name}/{mode}: sub-folder stem counts differ: {lens}")
        # *_info.npy (the reference's partition source, semi_seg/data/
        # dataset.py:35-183) must cover every scan with the on-disk count
        if ds._scan_info is not None:
            missing = [s for s in scans if s not in ds._scan_info]
            if missing:
                raise RuntimeError(
                    f"{data_name}/{mode}: scans missing from info file: "
                    f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
            bad = {s: (ds._scan_info[s], counts[s]) for s in scans
                   if ds._scan_info[s] != counts[s]}
            if bad:
                raise RuntimeError(
                    f"{data_name}/{mode}: info-file slice counts disagree "
                    f"with disk (scan: (info, disk)): {bad}")
        # partitions must be computable and in range for every stem
        parts = set(ds.get_partition_list())
        if not parts or max(parts) >= cls.partition_num or min(parts) < 0:
            raise RuntimeError(
                f"{data_name}/{mode}: partitions {sorted(parts)} outside "
                f"[0, {cls.partition_num})")
        # decode one actual pixel per mode (catches corrupt/truncated files)
        sample = ds[0]
        img = sample["image"]
        summary[mode] = {"scans": len(scans), "slices": len(stems),
                        "partitions": sorted(parts),
                        "sample_shape": tuple(img.shape),
                        "info_file": ds._scan_info is not None}
    return summary


def run_smoke(root: str | Path, data_name: str) -> None:
    """One tiny CLI training run over the ingested data (the verify-skill
    recipe, pointed at real pixels)."""
    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ, CONTRASTYOU_DATA_PATH=str(root),
               CONTRASTYOU_RUN_PATH=str(Path(root) / "_ingest_smoke_runs"))
    cmd = [sys.executable, str(repo / "main.py"),
           "-p", str(repo / "config/base.yaml"),
           str(repo / "config/hooks/consistency.yaml"),
           "-o", "Trainer.name=semi", "Trainer.max_epoch=1",
           "Trainer.num_batches=3", "Trainer.save_dir=ingest_smoke",
           f"Data.name={data_name}", "Data.labeled_scan_num=2",
           "Arch.max_channel=128", "LabeledLoader.batch_size=2",
           "UnlabeledLoader.batch_size=2", "Optim.lr=1e-4",
           "Scheduler.multiplier=1"]
    print("smoke:", " ".join(cmd))
    subprocess.run(cmd, check=True, env=env, cwd=repo)
    marker = Path(env["CONTRASTYOU_RUN_PATH"]) / "ingest_smoke" / ".success"
    if not marker.exists():
        raise RuntimeError(f"smoke run finished without {marker}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--archive", required=True,
                    help="local archive file (zip/tar[.gz|.xz]/tgz)")
    ap.add_argument("--data-name", required=True,
                    help="dataset key (acdc, prostate, prostate_md, mmwhsct, "
                         "mmwhsmr, spleen, hippocampus)")
    ap.add_argument("--root", default=os.environ.get(
        "CONTRASTYOU_DATA_PATH", str(Path.home() / ".contrastyou_tpu_data")),
        help="data root to extract into (default: $CONTRASTYOU_DATA_PATH)")
    ap.add_argument("--md5", default=None,
                    help="expected md5 (reference publishes none; digest is "
                         "always printed)")
    ap.add_argument("--smoke", action="store_true",
                    help="run a 1-epoch CLI training smoke after validation")
    args = ap.parse_args(argv)

    if not os.path.isfile(args.archive):
        print(f"error: archive not found: {args.archive}", file=sys.stderr)
        return 2
    digest = md5_file(args.archive)
    print(f"md5 {digest}  {args.archive}")
    if args.md5 and digest != args.md5.lower():
        print(f"error: md5 mismatch (expected {args.md5})", file=sys.stderr)
        return 3

    print(f"extracting into {args.root} ...")
    extract_archive(args.archive, args.root)
    summary = validate(args.root, args.data_name)
    for k, v in summary.items():
        print(f"  {k}: {v}")
    if args.smoke:
        run_smoke(args.root, args.data_name)
        print("smoke run OK")
    print("ingest OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
