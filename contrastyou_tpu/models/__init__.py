"""Architecture zoo (ref: contrastyou/arch/__init__.py:9 ``get_arch``)."""
from __future__ import annotations

from ._base import arch_order, complete_arch_start2end, sort_arch
from .discriminator import Discriminator
from .masks import mask_from_layer_predicate, merge_masks, trainable_mask
from .projectors import (ClusterHead, CrossCorrelationProjector,
                         DenseClusterHead, DenseProjectionHead, ProjectionHead)
from .resunet import ResUNet
from .unet import ConvBlock, UNet, UpConv
from .unet2 import UNet2

__all__ = ["arch_order", "complete_arch_start2end", "sort_arch", "Discriminator",
           "mask_from_layer_predicate", "merge_masks", "trainable_mask",
           "ClusterHead", "CrossCorrelationProjector", "DenseClusterHead",
           "DenseProjectionHead", "ProjectionHead", "ConvBlock", "ResUNet",
           "UNet", "UNet2", "UpConv", "get_arch"]

_arch_zoo = {"unet": UNet, "unet2": UNet2, "resunet": ResUNet}


def get_arch(name: str = "unet", **kwargs) -> UNet:
    """Build an architecture by registry name; kwargs mirror the reference
    config keys (input_dim, num_classes, max_channel, momentum)."""
    name = name.lower()
    if name not in _arch_zoo:
        raise KeyError(f"arch '{name}' not in {tuple(_arch_zoo)}")
    kwargs.pop("checkpoint", None)
    return _arch_zoo[name](**kwargs)


def register_arch(name: str, cls) -> None:
    _arch_zoo[name] = cls
