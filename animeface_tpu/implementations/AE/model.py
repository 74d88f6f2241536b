'''Convolutional autoencoder (reference `implementations/AE/model.py:79`):
strided-conv encoder to a bottleneck vector, upsample-conv decoder, selectable
norm/activation/output activation.'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation


class ConvBlock(nn.Module):
    features: int
    strides: int = 1
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=1, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return get_activation(self.act_name)(x)


class Encoder(nn.Module):
    enc_dim: int = 128
    image_size: int = 128
    min_size: int = 8
    channels: int = 32
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_downs = int(math.log2(self.image_size) - math.log2(self.min_size))
        x = ConvBlock(self.channels, act_name=self.act_name,
                      dtype=self.dtype)(x.astype(self.dtype), train)
        for _ in range(num_downs):
            x = ConvBlock(self.channels, strides=2, act_name=self.act_name,
                          dtype=self.dtype)(x, train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.enc_dim, dtype=self.dtype)(x)


class Decoder(nn.Module):
    image_size: int = 128
    min_size: int = 8
    channels: int = 32
    out_channels: int = 3
    act_name: str = 'relu'
    output_act: str = 'tanh'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        num_ups = int(math.log2(self.image_size) - math.log2(self.min_size))
        x = nn.Dense(self.channels * self.min_size ** 2, dtype=self.dtype)(
            z.astype(self.dtype))
        x = get_activation(self.act_name)(x)
        x = x.reshape(-1, self.min_size, self.min_size, self.channels)
        for _ in range(num_ups):
            x = ConvBlock(self.channels, act_name=self.act_name,
                          dtype=self.dtype)(x, train)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='bilinear')
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        if self.output_act == 'tanh':
            return jnp.tanh(x)
        return x   # sigmoid handled by BCE-with-logits loss


class AE(nn.Module):
    enc_dim: int = 128
    image_size: int = 128
    min_size: int = 8
    img_channels: int = 3
    channels: int = 32
    act_name: str = 'relu'
    output_act: str = 'tanh'
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.enc_dim, self.image_size, self.min_size,
                               self.channels, self.act_name, self.dtype)
        self.decoder = Decoder(self.image_size, self.min_size, self.channels,
                               self.img_channels, self.act_name,
                               self.output_act, self.dtype)

    def __call__(self, x, train: bool = True):
        return self.decoder(self.encoder(x, train), train)
