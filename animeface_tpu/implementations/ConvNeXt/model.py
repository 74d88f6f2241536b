'''ConvNeXt-ified GAN (reference `implementations/ConvNeXt/model.py`:
ConvNeXtBlock :22, flexible block study :45, Generator :132,
Discriminator :171). Flax NHWC; depthwise 7x7 + pointwise expansion with
zero-init gamma residual scaling.'''

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvNeXtBlock(nn.Module):
    channels: int
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.Conv(self.channels, (7, 7), padding=3,
                    feature_group_count=self.channels, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Conv(self.channels * self.expansion, (1, 1),
                    dtype=self.dtype)(x)
        x = jax.nn.gelu(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        gamma = self.param('gamma', nn.initializers.zeros_init(), ())
        return residual + x * gamma.astype(x.dtype)


class Generator(nn.Module):
    latent_dim: int = 128
    image_size: int = 128
    bottom: int = 4
    channels: int = 96
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
        for _ in range(num_ups):
            c //= 2
            och = min(max_c, c)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = nn.Conv(och, (1, 1), dtype=self.dtype)(x)
            for _ in range(self.blocks_per_scale):
                x = ConvNeXtBlock(och, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(len(self.depths)):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                            padding='VALID', dtype=self.dtype)(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2),
                            padding='VALID', dtype=self.dtype)(x)
            for _ in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        return nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))
