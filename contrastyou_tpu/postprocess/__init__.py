from .cluster import cluster_alignment, hungarian_match
from .superpixel import generate_superpixels, slic
from .tsne import tsne_embed

__all__ = ["cluster_alignment", "hungarian_match", "generate_superpixels",
           "slic", "tsne_embed"]
