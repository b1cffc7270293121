"""UNet2: ResNet-block U-Net with (linear) attention and optional sinusoidal
time embedding — the diffusion-style alternative architecture
(capability match for contrastyou/arch/unet2.py:22-313, selectable via
``Arch.name=unet2``).

TPU notes: attention uses one fused einsum per block (MXU); GroupNorm
throughout (no cross-batch state), channels-last.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .unet import upsample2x_nearest

__all__ = ["UNet2"]


class SinusoidalPosEmb(nn.Module):
    dim: int

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
        args = t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResnetBlock(nn.Module):
    dim_out: int
    groups: int = 8
    time_emb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME")(x)
        h = nn.GroupNorm(num_groups=min(self.groups, self.dim_out))(h)
        if time_emb is not None:
            h = h + nn.Dense(self.dim_out)(nn.silu(time_emb))[:, None, None, :]
        h = nn.silu(h)
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME")(h)
        h = nn.GroupNorm(num_groups=min(self.groups, self.dim_out))(h)
        h = nn.silu(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1))(x)
        return x + h


class LinearAttention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False)(x)
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3 * self.heads,
                                        self.dim_head), 3, axis=2)
        q = nn.softmax(q, axis=-1) * (self.dim_head ** -0.5)
        k = nn.softmax(k, axis=1)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, W, inner)
        return nn.Conv(self.dim, (1, 1))(out)


class Attention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False)(x)
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3 * self.heads,
                                        self.dim_head), 3, axis=2)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * self.dim_head ** -0.5, k)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, inner)
        return nn.Conv(self.dim, (1, 1))(out)


class _PreNormResidual(nn.Module):
    inner: nn.Module

    @nn.compact
    def __call__(self, x):
        return x + self.inner(nn.GroupNorm(num_groups=1)(x))


class UNet2(nn.Module):
    input_dim: int = 1
    num_classes: int = 4
    dim: int = 16
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    with_time_emb: bool = False
    resnet_block_groups: int = 8

    @nn.compact
    def __call__(self, x, *, time: Optional[jnp.ndarray] = None,
                 train: bool = True, until=None, taps: Tuple[str, ...] = ()):
        del train, until, taps  # UNet2 has no partial-forward registry
        init_dim = self.dim // 3 * 2
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]

        t_emb = None
        if self.with_time_emb:
            assert time is not None
            t_emb = SinusoidalPosEmb(self.dim)(time)
            t_emb = nn.Dense(self.dim * 4)(t_emb)
            t_emb = nn.gelu(t_emb)
            t_emb = nn.Dense(self.dim * 4)(t_emb)

        x = nn.Conv(init_dim, (7, 7), padding="SAME")(x)
        skips = []
        pairs = list(zip(dims[:-1], dims[1:]))
        for i, (_din, dout) in enumerate(pairs):
            is_last = i == len(pairs) - 1
            x = ResnetBlock(dout, self.resnet_block_groups,
                            self.dim * 4 if t_emb is not None else None)(x, t_emb)
            x = ResnetBlock(dout, self.resnet_block_groups,
                            self.dim * 4 if t_emb is not None else None)(x, t_emb)
            x = _PreNormResidual(LinearAttention(dout))(x)
            skips.append(x)
            if not is_last:
                x = nn.Conv(dout, (4, 4), strides=(2, 2),
                            padding=((1, 1), (1, 1)))(x)

        mid = dims[-1]
        x = ResnetBlock(mid, self.resnet_block_groups,
                        self.dim * 4 if t_emb is not None else None)(x, t_emb)
        x = _PreNormResidual(Attention(mid))(x)
        x = ResnetBlock(mid, self.resnet_block_groups,
                        self.dim * 4 if t_emb is not None else None)(x, t_emb)

        for i, (din, dout) in enumerate(reversed(pairs[1:])):
            is_last = i == len(pairs) - 1
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(din, self.resnet_block_groups,
                            self.dim * 4 if t_emb is not None else None)(x, t_emb)
            x = ResnetBlock(din, self.resnet_block_groups,
                            self.dim * 4 if t_emb is not None else None)(x, t_emb)
            x = _PreNormResidual(LinearAttention(din))(x)
            if not is_last:
                x = upsample2x_nearest(x)
                x = nn.Conv(din, (3, 3), padding="SAME")(x)

        x = ResnetBlock(self.dim, self.resnet_block_groups)(x)
        logits = nn.Conv(self.num_classes, (1, 1))(x)
        return logits.astype(jnp.float32), {}
