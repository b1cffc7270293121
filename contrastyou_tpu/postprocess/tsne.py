"""t-SNE feature embedding scatter (ref: semi_seg/postprocess/tsne.py)."""
from __future__ import annotations

from pathlib import Path

import numpy as np


def tsne_embed(features: np.ndarray, *, perplexity: float = 30.0,
               seed: int = 0) -> np.ndarray:
    """[N, d] -> [N, 2] t-SNE embedding."""
    from sklearn.manifold import TSNE
    perplexity = min(perplexity, max((len(features) - 1) / 3.0, 1.0))
    return TSNE(n_components=2, perplexity=perplexity,
                random_state=seed, init="pca").fit_transform(features)


def plot_tsne(features: np.ndarray, labels: np.ndarray, save_path: str | Path,
              show_legend: bool = False) -> str:
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    emb = tsne_embed(features)
    fig, ax = plt.subplots(figsize=(6, 6))
    for lab in np.unique(labels):
        m = labels == lab
        ax.scatter(emb[m, 0], emb[m, 1], s=6, label=str(lab))
    if show_legend:
        ax.legend(markerscale=2)
    ax.set_xticks([])
    ax.set_yticks([])
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return str(save_path)
