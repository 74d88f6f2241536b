'''CycleGAN (reference `implementations/CycleGAN/model.py`): ResNet
encoder-bottleneck-decoder generator with reflect-padded convs (:77), patch
discriminator (:141). Flax NHWC.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


def _reflect_conv(x, features, kernel, stride, dtype, name=None):
    pad = kernel // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='reflect')
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding='VALID', dtype=dtype, name=name)(x)


class ResBlock(nn.Module):
    channels: int
    num_conv: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for _ in range(self.num_conv):
            h = _reflect_conv(h, self.channels, 3, 1, self.dtype)
            h = _inorm(self.dtype)(h)
            h = jax.nn.relu(h)
        return x + h


class Generator(nn.Module):
    image_size: int = 128
    in_channels: int = 3
    out_channels: int = 3
    target_resl: int = 32
    channels: int = 32
    max_channels: int = 256
    num_blocks: int = 6
    block_num_conv: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_downs = max(0, int(np.log2(self.image_size)
                               - np.log2(self.target_resl)))
        c = och = self.channels
        x = _reflect_conv(x.astype(self.dtype), c, 7, 1, self.dtype)
        x = _inorm(self.dtype)(x)
        x = jax.nn.relu(x)
        for _ in range(num_downs):
            c *= 2
            och = min(self.max_channels, c)
            x = _reflect_conv(x, och, 3, 2, self.dtype)
            x = _inorm(self.dtype)(x)
            x = jax.nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResBlock(och, self.block_num_conv, self.dtype)(x)
        for _ in range(num_downs):
            c //= 2
            och = min(self.max_channels, c)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = _reflect_conv(x, och, 3, 1, self.dtype)
            x = _inorm(self.dtype)(x)
            x = jax.nn.relu(x)
        x = _reflect_conv(x, self.out_channels, 7, 1, self.dtype)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    '''PatchGAN discriminator (:141).'''
    channels: int = 64
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x.astype(self.dtype))
        x = jax.nn.leaky_relu(x, 0.2)
        for i in range(self.num_layers - 1):
            c *= 2
            stride = 2 if i < self.num_layers - 2 else 1
            x = nn.Conv(c, (4, 4), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
            x = _inorm(self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        return x.astype(jnp.float32)
