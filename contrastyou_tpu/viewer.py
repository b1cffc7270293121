"""Interactive multi-slice volume viewer (capability match for
contrastyou/viewer.py:57+): scroll through 2D slices of one or more aligned
volumes with optional segmentation contours."""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


class SliceViewer:
    def __init__(self, *volumes: np.ndarray, masks=None, cmap: str = "gray"):
        assert volumes, "at least one volume"
        self.volumes = [np.asarray(v) for v in volumes]
        self.masks = [np.asarray(m) for m in masks] if masks else None
        self.index = self.volumes[0].shape[0] // 2
        self._cmap = cmap

    def show(self):  # pragma: no cover - interactive
        import matplotlib.pyplot as plt
        n = len(self.volumes)
        fig, axes = plt.subplots(1, n, squeeze=False)
        self.axes = axes[0]
        self.fig = fig
        self._draw()
        fig.canvas.mpl_connect("scroll_event", self._on_scroll)
        fig.canvas.mpl_connect("key_press_event", self._on_key)
        plt.show()

    def _draw(self):
        for i, (ax, vol) in enumerate(zip(self.axes, self.volumes)):
            ax.clear()
            ax.imshow(vol[self.index], cmap=self._cmap)
            if self.masks is not None and i < len(self.masks):
                ax.contour(self.masks[i][self.index], linewidths=0.7)
            ax.set_title(f"slice {self.index}/{vol.shape[0] - 1}")
            ax.axis("off")
        self.fig.canvas.draw_idle()

    def _on_scroll(self, event):  # pragma: no cover
        self._step(1 if event.button == "up" else -1)

    def _on_key(self, event):  # pragma: no cover
        if event.key in ("up", "right"):
            self._step(1)
        elif event.key in ("down", "left"):
            self._step(-1)

    def _step(self, delta: int):
        self.index = int(np.clip(self.index + delta, 0,
                                 self.volumes[0].shape[0] - 1))
        self._draw()


def load_volume_from_pngs(folder: str | Path) -> np.ndarray:
    from PIL import Image
    paths = sorted(Path(folder).glob("*.png"))
    return np.stack([np.asarray(Image.open(p).convert("L")) for p in paths])


def main():  # pragma: no cover - CLI
    parser = argparse.ArgumentParser(description="multi-slice volume viewer")
    parser.add_argument("folders", nargs="+",
                        help="folders of per-slice PNGs (aligned volumes)")
    args = parser.parse_args()
    volumes = [load_volume_from_pngs(f) for f in args.folders]
    SliceViewer(*volumes).show()


if __name__ == "__main__":  # pragma: no cover
    main()
