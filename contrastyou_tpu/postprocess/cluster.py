"""Cluster visualization helpers: Hungarian matching of cluster ids to a
reference segmentation (ref: semi_seg/postprocess/visualize_clusters.py +
visualize_cluster_uncertanty.py:70-113)."""
from __future__ import annotations

import typing as t

import numpy as np
from scipy.optimize import linear_sum_assignment


def hungarian_match(cluster: np.ndarray, reference: np.ndarray,
                    num_clusters: int) -> t.Dict[int, int]:
    """Best one-to-one mapping cluster-id -> reference-id maximizing overlap."""
    votes = np.zeros((num_clusters, num_clusters), np.int64)
    for c in range(num_clusters):
        mask = cluster == c
        for r in range(num_clusters):
            votes[c, r] = int((mask & (reference == r)).sum())
    rows, cols = linear_sum_assignment(-votes)
    return {int(c): int(r) for c, r in zip(rows, cols)}


def cluster_alignment(cluster: np.ndarray, reference: np.ndarray,
                      num_clusters: int | None = None) -> np.ndarray:
    """Relabel ``cluster`` so its ids align with ``reference``."""
    k = num_clusters or int(max(cluster.max(), reference.max()) + 1)
    mapping = hungarian_match(cluster, reference, k)
    out = np.zeros_like(cluster)
    for src, dst in mapping.items():
        out[cluster == src] = dst
    return out
