'''Visual Attention Network GAN (reference `implementations/VAN/model.py`:
AttentionModule :23 — large-kernel attention as depthwise 5x5 + dilated
depthwise 7x7 + pointwise gating — stages :66,130). Flax NHWC.'''

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class AttentionModule(nn.Module):
    '''LKA gate (reference :23).'''
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn = nn.Conv(self.channels, (5, 5), padding=2,
                       feature_group_count=self.channels, dtype=self.dtype)(x)
        attn = nn.Conv(self.channels, (7, 7), padding=9, kernel_dilation=3,
                       feature_group_count=self.channels, dtype=self.dtype)(attn)
        attn = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(attn)
        return x * attn


class Block(nn.Module):
    channels: int
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.param('layer_scale1',
                        nn.initializers.constant(1e-6), ())
        s2 = self.param('layer_scale2',
                        nn.initializers.constant(1e-6), ())
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + s1.astype(x.dtype) * AttentionModule(self.channels,
                                                     self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Conv(self.channels * self.expansion, (1, 1),
                    dtype=self.dtype)(h)
        h = jax.nn.gelu(h)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(h)
        return x + s2.astype(x.dtype) * h


class Generator(nn.Module):
    latent_dim: int = 128
    image_size: int = 128
    bottom: int = 4
    channels: int = 64
    max_channels: int | None = None
    blocks_per_scale: int = 2
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        num_ups = int(math.log2(self.image_size) - math.log2(self.bottom))
        max_c = self.max_channels or self.channels * 16
        c = self.channels * 2 ** num_ups
        och = min(max_c, c)
        x = nn.Dense(och * self.bottom ** 2, dtype=self.dtype)(
            z.astype(self.dtype))
        x = jax.nn.gelu(x)
        x = x.reshape(-1, self.bottom, self.bottom, och)
        for i in range(num_ups):
            if i > 0:
                x = nn.LayerNorm(dtype=self.dtype)(x)
            c //= 2
            och = min(max_c, c)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = nn.Conv(och, (3, 3), padding=1, dtype=self.dtype)(x)
            for _ in range(self.blocks_per_scale):
                x = Block(och, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    channels: int = 32
    depths: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        c = self.channels
        for i, depth in enumerate(self.depths):
            if i == 0:
                x = nn.Conv(c, (7, 7), strides=(4, 4), padding=3,
                            dtype=self.dtype)(x)
            else:
                c *= 2
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            for _ in range(depth):
                x = Block(c, dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))
