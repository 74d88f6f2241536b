'''pix2pix (reference `implementations/pix2pix/model.py:53,100`): 8-level UNet
generator with skip concats, conditional patch discriminator on the
(input ‖ output) pair. Flax NHWC; depth adapts to image_size (reference is
fixed to 256px / 8 downs).'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


class Down(nn.Module):
    features: int
    normalize: bool = True
    leaky: bool = True
    drop_out: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        if self.normalize:
            x = _inorm(self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2) if self.leaky else jax.nn.relu(x)
        if self.drop_out > 0:
            x = nn.Dropout(self.drop_out, deterministic=not train)(x)
        return x


class Up(nn.Module):
    features: int
    drop_out: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding='SAME', dtype=self.dtype)(x)
        x = _inorm(self.dtype)(x)
        x = jax.nn.relu(x)
        if self.drop_out > 0:
            x = nn.Dropout(self.drop_out, deterministic=not train)(x)
        return x


class Generator(nn.Module):
    '''UNet; bottleneck at 1x1 (depth = log2(image_size)).'''
    image_size: int = 256
    image_channels: int = 3
    drop_out: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        depth = int(math.log2(self.image_size))
        chans = [min(512, 64 * 2 ** i) for i in range(depth)]
        x = x.astype(self.dtype)

        skips = []
        for i, ch in enumerate(chans):
            first, last = i == 0, i == depth - 1
            x = Down(ch, normalize=not (first or last), leaky=not last,
                     drop_out=self.drop_out if ch == 512 and not last else 0.0,
                     dtype=self.dtype)(x, train)
            if not last:
                skips.append(x)

        for i, ch in enumerate(reversed(chans[:-1])):
            drop = self.drop_out if ch == 512 else 0.0
            x = Up(ch, drop, dtype=self.dtype)(x, train)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = nn.ConvTranspose(self.image_channels, (4, 4), strides=(2, 2),
                             padding='SAME', dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    '''Conditional patch D over (condition ‖ image) (:100).'''
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i, ch in enumerate((64, 128, 256, 512)):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(x)
            if i > 0:
                x = _inorm(self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)(x)
        return x.astype(jnp.float32)
