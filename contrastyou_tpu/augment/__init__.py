from .host import (CenterCrop, Compose, HostTransform, LabelRemap, RandomCrop,
                   Resize, TransformSpec, transform_zoo)

__all__ = ["CenterCrop", "Compose", "HostTransform", "LabelRemap", "RandomCrop",
           "Resize", "TransformSpec", "transform_zoo"]
