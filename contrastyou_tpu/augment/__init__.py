from .host import (CenterCrop, Compose, HostTransform, LabelRemap, RandomCrop,
                   Resize, SobelProcess, TransformSpec, transform_zoo)

__all__ = ["CenterCrop", "Compose", "HostTransform", "LabelRemap", "RandomCrop",
           "Resize", "SobelProcess", "TransformSpec", "transform_zoo"]
