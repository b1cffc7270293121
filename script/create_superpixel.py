"""Precompute SLIC superpixel maps for a dataset split — the preprocessing
entry point for superpixel-guided dense InfoNCE pretraining.

Capability match for the reference's script/create_superpixel.py:13-30
(which used skimage.slic over the ACDC train split and wrote
``{mode}/superpixel/{stem}.png`` next to the img folder). This environment
has no skimage; `contrastyou_tpu.postprocess.slic` is our own
implementation, and `generate_superpixels` writes the identical layout the
``acdc_superpixel`` dataset (data/datasets.py sub_folders) expects.

Usage:
  python script/create_superpixel.py /path/to/ACDC_contrast \
      --mode train --n-segments 40 --compactness 0.1
"""
from __future__ import annotations

import argparse
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from contrastyou_tpu.postprocess import generate_superpixels  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("root", type=str, help="dataset root (contains train/val)")
    parser.add_argument("--mode", default="train", choices=("train", "val", "test"))
    parser.add_argument("--n-segments", type=int, default=40)
    parser.add_argument("--compactness", type=float, default=0.1)
    args = parser.parse_args()
    written = generate_superpixels(args.root, mode=args.mode,
                                   n_segments=args.n_segments,
                                   compactness=args.compactness)
    print(f"wrote {written} superpixel maps under "
          f"{Path(args.root) / args.mode / 'superpixel'}")


if __name__ == "__main__":
    main()
