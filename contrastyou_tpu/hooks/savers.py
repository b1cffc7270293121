"""Run-artifact savers for hook visualizations.

Capability match for semi_seg/hooks/utils.py:105-270 (FeatureMapSaver /
DistributionTracker / MatrixSaver): periodic dumps of feature maps, cluster
distributions and raw matrices into the run directory, zipped on close, plus
the joint-matrix TensorBoard figure helper (``joint_2D_figure``).
"""
from __future__ import annotations

import shutil
import zipfile
from pathlib import Path

import numpy as np
from PIL import Image


def _norm01(x: np.ndarray) -> np.ndarray:
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / (hi - lo + 1e-8)


def _to_png(arr: np.ndarray, path: Path) -> None:
    Image.fromarray((_norm01(arr) * 255).astype(np.uint8)).save(path)


class FeatureMapSaver:
    """Save image + two feature/probability maps as PNG panels per epoch."""

    def __init__(self, save_dir: str, folder_name: str = "vis"):
        self.root = Path(save_dir) / folder_name
        self.root.mkdir(parents=True, exist_ok=True)

    def save_map(self, *, image, feature_map1, feature_map2, cur_epoch: int,
                 cur_batch_num: int = 0, save_name: str = "feature",
                 feature_type: str = "map") -> None:
        folder = self.root / f"epoch_{cur_epoch:03d}"
        folder.mkdir(exist_ok=True)
        image = np.asarray(image)
        f1 = np.asarray(feature_map1)
        f2 = np.asarray(feature_map2)
        _to_png(image[0, ..., 0] if image.ndim == 4 else image[0],
                folder / f"{save_name}_{cur_batch_num}_image.png")
        for tag, fmap in (("a", f1), ("b", f2)):
            fm = fmap[0]
            panel = fm.mean(-1) if fm.ndim == 3 else fm
            _to_png(panel, folder / f"{save_name}_{cur_batch_num}_{tag}.png")

    def zip(self) -> str:
        out = self.root.with_suffix(".zip")
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in self.root.rglob("*"):
                zf.write(p, p.relative_to(self.root.parent))
        shutil.rmtree(self.root)
        return str(out)


class DistributionTracker:
    """Save per-epoch cluster-assignment histograms of two distributions."""

    def __init__(self, save_dir: str, folder_name: str = "dist"):
        self.root = Path(save_dir) / folder_name
        self.root.mkdir(parents=True, exist_ok=True)

    def save_map(self, *, dist1, dist2, cur_epoch: int) -> None:
        d1 = np.asarray(dist1).reshape(-1, np.asarray(dist1).shape[-1])
        d2 = np.asarray(dist2).reshape(-1, np.asarray(dist2).shape[-1])
        np.savez_compressed(self.root / f"epoch_{cur_epoch:03d}.npz",
                            hist1=np.bincount(d1.argmax(-1),
                                              minlength=d1.shape[-1]),
                            hist2=np.bincount(d2.argmax(-1),
                                              minlength=d2.shape[-1]))

    def zip(self) -> str:
        out = self.root.with_suffix(".zip")
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in self.root.rglob("*"):
                zf.write(p, p.relative_to(self.root.parent))
        shutil.rmtree(self.root)
        return str(out)


class MatrixSaver:
    """Raw npz dumps of arbitrary matrices (feature/probability tensors)."""

    def __init__(self, save_dir: str, folder_name: str = "matrix"):
        self.root = Path(save_dir) / folder_name
        self.root.mkdir(parents=True, exist_ok=True)

    def save_matrix(self, *, matrix, cur_epoch: int, cur_batch_num: int,
                    save_name: str) -> None:
        np.savez_compressed(
            self.root / f"{save_name}_e{cur_epoch:03d}_b{cur_batch_num}.npz",
            matrix=np.asarray(matrix))


def joint_2D_figure(joint: np.ndarray, *, tb_writer, cur_epoch: int,
                    tag: str) -> None:
    """Log a k x k joint matrix heatmap to TensorBoard (ref hooks/utils.py
    joint_2D_figure)."""
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    im = ax.imshow(np.asarray(joint), cmap="viridis")
    fig.colorbar(im)
    tb_writer.add_figure(tag=tag, figure=fig, global_step=cur_epoch)
    plt.close(fig)
