"""torch-reference weight conversion (UNet) + local .npz warm-start loading.

Covers two needs:
- matched-init baseline runs (tools/baseline_measure.py): start the rebuild
  from the torch reference's exact initialization so Dice trajectories are
  comparable at matched steps (torch kaiming_uniform vs flax lecun_normal
  inits otherwise dominate short-run curves);
- offline pretrained warm starts (VERDICT r2 missing #4 / next #8): the
  reference loads ImageNet encoder weights at construction (arch/smp.py:15);
  in egress-blocked environments the equivalent is a LOCAL archive:
  ``Arch.pretrained_path=/path/w.npz`` (see tools/convert_torch_weights.py
  for producing the archive where torch + downloads exist).

Key mapping (reference arch/unet.py:16-47, state_dict names):
  _ConvX.conv.0.weight  [O,I,3,3] -> ConvX/conv0/kernel  [3,3,I,O]
  _ConvX.conv.1.*       (BN)      -> ConvX/bn0/{scale,bias} + batch_stats
  _ConvX.conv.3/.4                -> ConvX/conv1, ConvX/bn1
  _UpX.up.1.weight, _UpX.up.2.*   -> UpX/conv/kernel, UpX/bn/*
  _Deconv_1x1.weight/.bias        -> Deconv_1x1/{kernel,bias}
The decoder concat order matches (skip first: unet.py:142 cat((e4, d5)) ==
ConvBlock(x, skip) semantics), so converted weights are drop-in.
"""
from __future__ import annotations

import typing as t

import numpy as np

__all__ = ["convert_unet_state_dict", "load_npz_tree", "save_npz_tree",
           "merge_pretrained"]

_CONV_BLOCKS = ("Conv1", "Conv2", "Conv3", "Conv4", "Conv5",
                "Up_conv5", "Up_conv4", "Up_conv3", "Up_conv2")
_UP_BLOCKS = ("Up5", "Up4", "Up3", "Up2")


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_unet_state_dict(sd: t.Mapping[str, np.ndarray]) -> dict:
    """Reference-UNet torch ``state_dict`` (numpy values, names as exported
    by ``{k: v.numpy() for k, v in net.state_dict().items()}``) ->
    ``{"params": ..., "batch_stats": ...}`` flax variable trees matching
    models/unet.py. Raises KeyError on missing entries."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def bn(prefix: str) -> tuple[dict, dict]:
        return ({"scale": sd[f"{prefix}.weight"],
                 "bias": sd[f"{prefix}.bias"]},
                {"mean": sd[f"{prefix}.running_mean"],
                 "var": sd[f"{prefix}.running_var"]})

    for name in _CONV_BLOCKS:
        base = f"_{name}.conv"
        s0, b0 = bn(f"{base}.1")
        s1, b1 = bn(f"{base}.4")
        params[name] = {
            "conv0": {"kernel": _oihw_to_hwio(sd[f"{base}.0.weight"])},
            "bn0": s0,
            "conv1": {"kernel": _oihw_to_hwio(sd[f"{base}.3.weight"])},
            "bn1": s1,
        }
        stats[name] = {"bn0": b0, "bn1": b1}
    for name in _UP_BLOCKS:
        base = f"_{name}.up"
        s, b = bn(f"{base}.2")
        params[name] = {
            "conv": {"kernel": _oihw_to_hwio(sd[f"{base}.1.weight"])},
            "bn": s,
        }
        stats[name] = {"bn": b}
    params["Deconv_1x1"] = {
        "kernel": _oihw_to_hwio(sd["_Deconv_1x1.weight"]),
        "bias": sd["_Deconv_1x1.bias"],
    }
    return {"params": params, "batch_stats": stats}


def save_npz_tree(path: str, tree: t.Mapping) -> None:
    """Flatten a nested dict-of-arrays to ``a/b/c`` keys and save as npz."""
    flat: dict[str, np.ndarray] = {}

    def rec(prefix, node):
        if isinstance(node, t.Mapping):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", tree)
    np.savez(path, **flat)


def load_npz_tree(path: str) -> dict:
    """Inverse of :func:`save_npz_tree`."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


def merge_pretrained(init_tree: t.Mapping, archive_tree: t.Mapping,
                     _prefix: str = "") -> tuple[dict, list[str], list[str]]:
    """Partial warm start (torch ``load_state_dict(strict=False)``
    semantics, the reference's pretrained-encoder behavior arch/smp.py:15):
    overlay ``archive_tree`` leaves onto ``init_tree`` wherever the path
    exists AND the shape matches. Returns (merged, loaded_paths,
    skipped_paths); untouched init leaves keep their values — an
    encoder-only archive warm-starts Conv1..Conv5 and leaves the decoder at
    its fresh initialization."""
    merged: dict = {}
    loaded: list[str] = []
    skipped: list[str] = []
    for k, v in init_tree.items():
        path = f"{_prefix}/{k}" if _prefix else str(k)
        if isinstance(v, t.Mapping):
            sub = archive_tree.get(k, {}) if isinstance(
                archive_tree, t.Mapping) else {}
            m, lo, sk = merge_pretrained(v, sub, path)
            merged[k] = m
            loaded += lo
            skipped += sk
        elif (isinstance(archive_tree, t.Mapping) and k in archive_tree
              and np.shape(archive_tree[k]) == np.shape(v)):
            merged[k] = np.asarray(archive_tree[k])
            loaded.append(path)
        else:
            merged[k] = v
            if isinstance(archive_tree, t.Mapping) and k in archive_tree:
                skipped.append(path)   # present but shape-mismatched
    return merged, loaded, skipped
