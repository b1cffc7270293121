"""ResNet-encoder U-Net — the TPU-native stand-in for the reference's
``UNet_SMP`` adapter (contrastyou/arch/smp.py:15-135), which wrapped
segmentation_models_pytorch resnet encoders into the named-layer protocol.

Same public surface as UNet: encoder stages named Conv1..Conv5 (so layer-range
freezing, taps and partial forward work unchanged), standard decoder.
ImageNet checkpoints are not bundled (no network egress); ``Arch.checkpoint``
warm-starts from any saved params instead.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .unet import ConvBlock, UpConv

__all__ = ["ResUNet"]


class ResidualBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - self.momentum, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - self.momentum, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class _ResStage(nn.Module):
    features: int
    blocks: int
    downsample: bool
    momentum: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        for i in range(self.blocks):
            strides = (2, 2) if (i == 0 and self.downsample) else (1, 1)
            x = ResidualBlock(self.features, strides, self.momentum,
                              self.dtype)(x, train=train)
        return x


class ResUNet(nn.Module):
    layer_dimension = {"Conv1": 1, "Conv2": 2, "Conv3": 4, "Conv4": 8,
                       "Conv5": 16, "Up_conv5": 8, "Up_conv4": 4,
                       "Up_conv3": 2, "Up_conv2": 1, "Deconv_1x1": None}
    encoder_names = ("Conv1", "Conv2", "Conv3", "Conv4", "Conv5")
    decoder_names = ("Up5", "Up_conv5", "Up4", "Up_conv4", "Up3", "Up_conv3",
                     "Up2", "Up_conv2", "Deconv_1x1")
    arch_elements = encoder_names + decoder_names

    input_dim: int = 1
    num_classes: int = 4
    max_channel: int = 256
    blocks_per_stage: int = 2
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    def get_channel_dim(self, name: str) -> int:
        if name == "Deconv_1x1":
            return self.num_classes
        if name in self.layer_dimension:
            return int(self.layer_dimension[name] / 16 * self.max_channel)
        raise KeyError(name)

    def setup(self):
        cd = self.get_channel_dim
        kw = dict(momentum=self.momentum, dtype=self.dtype)
        self.Conv1 = _ResStage(cd("Conv1"), self.blocks_per_stage, False, **kw)
        self.Conv2 = _ResStage(cd("Conv2"), self.blocks_per_stage, True, **kw)
        self.Conv3 = _ResStage(cd("Conv3"), self.blocks_per_stage, True, **kw)
        self.Conv4 = _ResStage(cd("Conv4"), self.blocks_per_stage, True, **kw)
        self.Conv5 = _ResStage(cd("Conv5"), self.blocks_per_stage, True, **kw)
        dec_kw = dict(momentum=self.momentum, dtype=self.dtype)
        self.Up5 = UpConv(cd("Up_conv5"), **dec_kw)
        self.Up_conv5 = ConvBlock(cd("Up_conv5"), **dec_kw)
        self.Up4 = UpConv(cd("Up_conv4"), **dec_kw)
        self.Up_conv4 = ConvBlock(cd("Up_conv4"), **dec_kw)
        self.Up3 = UpConv(cd("Up_conv3"), **dec_kw)
        self.Up_conv3 = ConvBlock(cd("Up_conv3"), **dec_kw)
        self.Up2 = UpConv(cd("Up_conv2"), **dec_kw)
        self.Up_conv2 = ConvBlock(cd("Up_conv2"), **dec_kw)
        self.Deconv_1x1 = nn.Conv(self.num_classes, (1, 1), padding="VALID",
                                  dtype=self.dtype, name="Deconv_1x1")

    def __call__(self, x: jnp.ndarray, *, until: Optional[str] = None,
                 taps: Sequence[str] = (), train: bool = True):
        taps = tuple(taps)
        collected: dict = {}

        def emit(name, value):
            if name in taps:
                collected[name] = value.astype(jnp.float32)
            return until == name

        x = x.astype(self.dtype)
        e1 = self.Conv1(x, train=train)
        if emit("Conv1", e1):
            return e1.astype(jnp.float32), collected
        e2 = self.Conv2(e1, train=train)
        if emit("Conv2", e2):
            return e2.astype(jnp.float32), collected
        e3 = self.Conv3(e2, train=train)
        if emit("Conv3", e3):
            return e3.astype(jnp.float32), collected
        e4 = self.Conv4(e3, train=train)
        if emit("Conv4", e4):
            return e4.astype(jnp.float32), collected
        e5 = self.Conv5(e4, train=train)
        if emit("Conv5", e5):
            return e5.astype(jnp.float32), collected

        d5 = self.Up_conv5(jnp.concatenate([e4, self.Up5(e5, train=train)], -1),
                           train=train)
        if emit("Up_conv5", d5):
            return d5.astype(jnp.float32), collected
        d4 = self.Up_conv4(jnp.concatenate([e3, self.Up4(d5, train=train)], -1),
                           train=train)
        if emit("Up_conv4", d4):
            return d4.astype(jnp.float32), collected
        d3 = self.Up_conv3(jnp.concatenate([e2, self.Up3(d4, train=train)], -1),
                           train=train)
        if emit("Up_conv3", d3):
            return d3.astype(jnp.float32), collected
        d2 = self.Up_conv2(jnp.concatenate([e1, self.Up2(d3, train=train)], -1),
                           train=train)
        if emit("Up_conv2", d2):
            return d2.astype(jnp.float32), collected
        logits = self.Deconv_1x1(d2).astype(jnp.float32)
        emit("Deconv_1x1", logits)
        return logits, collected
