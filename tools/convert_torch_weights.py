"""Convert torch checkpoints to the npz archives ``Arch.pretrained_path``
consumes (run this where torch + the weight files exist; the training
environment itself needs no torch and no network egress).

Modes:
  unet            a reference-UNet state_dict (.pth) -> full params +
                  batch_stats archive (exact mapping, golden-tested in
                  tests/test_reference_parity.py)
  resnet-encoder  a torchvision/smp resnet state_dict -> a ResUNet ENCODER
                  archive (best effort: basic-block conv/bn tensors mapped
                  onto models/resunet.py ResidualBlock names; entries whose
                  shapes differ — e.g. the 7x7 stem — are carried over and
                  skipped at load time by merge_pretrained's
                  load_state_dict(strict=False) semantics, matching how the
                  reference's smp wrapper consumed ImageNet weights,
                  arch/smp.py:15)

Usage:
  python tools/convert_torch_weights.py unet ckpt.pth out.npz
  python tools/convert_torch_weights.py resnet-encoder resnet34.pth out.npz
Then train with:  -o Arch.pretrained_path=/path/out.npz
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.append(str(Path(__file__).resolve().parent.parent))

from contrastyou_tpu.utils.torch_convert import (  # noqa: E402
    convert_unet_state_dict, save_npz_tree)


def _load_state_dict(path: str) -> dict:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()}


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_resnet_encoder(sd: dict) -> dict:
    """torchvision-style resnet basic-block names -> ResUNet encoder tree.

    layer{i}.{j}.conv1/bn1/conv2/bn2/downsample.0 map onto
    Conv{i+1}/ResidualBlock_{j}/{Conv_0,BatchNorm_0,Conv_1,BatchNorm_1,
    Conv_2}. The stem (7x7 conv1/bn1) and bottleneck blocks have no
    same-shape counterpart and are left out; downsample.1 (shortcut BN) has
    no counterpart in ResidualBlock and is dropped."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for k, v in sd.items():
        parts = k.split(".")
        if len(parts) < 4 or not parts[0].startswith("layer"):
            continue
        stage = f"Conv{int(parts[0][5:]) + 1}"
        block = f"ResidualBlock_{int(parts[1])}"
        sub, leaf = parts[2], parts[-1]
        if sub == "conv1" and leaf == "weight":
            put(params, (stage, block, "Conv_0", "kernel"), _oihw_to_hwio(v))
        elif sub == "conv2" and leaf == "weight":
            put(params, (stage, block, "Conv_1", "kernel"), _oihw_to_hwio(v))
        elif sub == "downsample" and parts[3] == "0" and leaf == "weight":
            put(params, (stage, block, "Conv_2", "kernel"), _oihw_to_hwio(v))
        elif sub in ("bn1", "bn2"):
            bn = "BatchNorm_0" if sub == "bn1" else "BatchNorm_1"
            if leaf == "weight":
                put(params, (stage, block, bn, "scale"), v)
            elif leaf == "bias":
                put(params, (stage, block, bn, "bias"), v)
            elif leaf == "running_mean":
                put(stats, (stage, block, bn, "mean"), v)
            elif leaf == "running_var":
                put(stats, (stage, block, bn, "var"), v)
    return {"params": params, "batch_stats": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["unet", "resnet-encoder"])
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args()
    sd = _load_state_dict(args.src)
    if args.mode == "unet":
        tree = convert_unet_state_dict(sd)
    else:
        tree = convert_resnet_encoder(sd)
    save_npz_tree(args.dst, tree)
    n = sum(1 for _ in np.load(args.dst).files)
    print(f"wrote {args.dst}: {n} tensors")


if __name__ == "__main__":
    main()
