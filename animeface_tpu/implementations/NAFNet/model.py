'''NAFNet line-art colorization (reference `implementations/NAFNet/model.py`):
nonlinear-activation-free UNet — SimpleGate channel-split gating (:20),
simplified channel attention (:45), pixel-shuffle/unshuffle resampling, with
a patch discriminator. Flax NHWC.'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import pixel_shuffle


def pixel_unshuffle(x, factor: int = 2):
    N, H, W, C = x.shape
    r = factor
    x = x.reshape(N, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(N, H // r, W // r, C * r * r)


def simple_gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


class NAFBlock(nn.Module):
    channels: int
    mlp_ratio: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = self.channels
        s1 = self.param('layer_scale1', nn.initializers.constant(1e-3), ())
        s2 = self.param('layer_scale2', nn.initializers.constant(1e-3), ())

        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Conv(C * 2, (1, 1), dtype=self.dtype)(h)
        h = nn.Conv(C * 2, (3, 3), padding=1, feature_group_count=C * 2,
                    dtype=self.dtype)(h)
        h = simple_gate(h)
        gc = jnp.mean(h, axis=(1, 2), keepdims=True)
        gc = nn.Conv(C, (1, 1), dtype=self.dtype)(gc)
        h = h * gc
        h = nn.Conv(C, (1, 1), dtype=self.dtype)(h)
        x = x + s1.astype(x.dtype) * h

        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Conv(C * self.mlp_ratio * 2, (1, 1), dtype=self.dtype)(h)
        h = simple_gate(h)
        h = nn.Conv(C, (1, 1), dtype=self.dtype)(h)
        return x + s2.astype(x.dtype) * h


class NAFNet(nn.Module):
    image_size: int = 128
    bottom: int = 16
    channels: int = 64
    max_channels: int = 512
    blocks_per_scale: int = 2
    mid_blocks: int = 6
    mlp_ratio: int = 1
    in_channels: int = 1
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        num = int(math.log2(self.image_size) - math.log2(self.bottom))
        c = self.channels
        x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype))
        feats = []
        for _ in range(num):
            for _ in range(self.blocks_per_scale):
                x = NAFBlock(c, self.mlp_ratio, self.dtype)(x)
            feats.append(x)
            nc = min(self.max_channels, c * 2)
            x = nn.Conv(nc // 4, (3, 3), padding=1, dtype=self.dtype)(x)
            x = pixel_unshuffle(x, 2)
            c = nc
        for _ in range(self.mid_blocks):
            x = NAFBlock(c, self.mlp_ratio, self.dtype)(x)
        for _ in range(num):
            nc = c // 2
            x = nn.Conv(nc * 4, (3, 3), padding=1, dtype=self.dtype)(x)
            x = pixel_shuffle(x, 2)
            x = x + feats.pop()
            for _ in range(self.blocks_per_scale):
                x = NAFBlock(nc, self.mlp_ratio, self.dtype)(x)
            c = nc
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    num_layers: int = 3
    channels: int = 64
    max_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.channels
        x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x.astype(self.dtype))
        x = jax.nn.leaky_relu(x, 0.2)
        for _ in range(self.num_layers - 1):
            c = min(self.max_channels, c * 2)
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        return x.astype(jnp.float32)
