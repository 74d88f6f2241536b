'''Convolutional autoencoder (reference `implementations/AE/model.py:79`):
strided-conv encoder to a bottleneck vector, upsample-conv decoder, selectable
norm/activation/upsample-mode/output activation.

TPU delta: the reference's `nn.Upsample(scale_factor=2, mode=up_mode)` is
`jax.image.resize` with the same method — everything else follows the
reference layer-for-layer (constant-width blocks, conv-then-upsample order).
'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation, get_normalization


def resolve_depth(image_size: int, min_size: int | None,
                  num_layers: int | None) -> tuple[int, int]:
    '''(min_size, num_layers) resolution (reference model.py:84-92):
    num_layers wins if given; otherwise derived from min_size.'''
    if num_layers:
        assert math.log2(image_size) > num_layers
        min_size = 2 ** int(math.log2(image_size) - num_layers + 1)
    elif min_size:
        num_layers = int(math.log2(image_size) - math.log2(min_size))
    else:
        raise Exception('need at least one of "min_size" / "num_layers"')
    return min_size, num_layers


class ConvBlock(nn.Module):
    '''3x3 conv -> norm -> act (reference model.py:18).'''
    features: int
    strides: int = 1
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=1, dtype=self.dtype)(x)
        if self.norm_name == 'bn':
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
        elif self.norm_name == 'in':
            x = get_normalization('in', self.features, dtype=self.dtype)(x)
        # anything else -> identity (reference model.py:10)
        return get_activation(self.act_name)(x)


class Encoder(nn.Module):
    '''Constant-width strided stack -> flatten -> Dense (reference
    model.py:43).'''
    enc_dim: int = 128
    num_layers: int = 4
    channels: int = 64
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBlock(self.channels, 1, self.norm_name, self.act_name,
                      self.dtype)(x.astype(self.dtype), train)
        for _ in range(self.num_layers):
            x = ConvBlock(self.channels, 2, self.norm_name, self.act_name,
                          self.dtype)(x, train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.enc_dim, dtype=self.dtype)(x)


class Decoder(nn.Module):
    '''Dense -> view -> [conv, 2x resize] ladder -> conv + output act
    (reference model.py:59).'''
    num_layers: int = 4
    min_size: int = 8
    channels: int = 64
    out_channels: int = 3
    norm_name: str = 'bn'
    act_name: str = 'relu'
    up_mode: str = 'bilinear'
    output_act: str = 'tanh'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = nn.Dense(self.channels * self.min_size ** 2, dtype=self.dtype)(
            z.astype(self.dtype))
        x = get_activation(self.act_name)(x)
        x = x.reshape(-1, self.min_size, self.min_size, self.channels)
        for _ in range(self.num_layers):
            x = ConvBlock(self.channels, 1, self.norm_name, self.act_name,
                          self.dtype)(x, train)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C),
                                 method=self.up_mode)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        if self.output_act == 'tanh':
            return jnp.tanh(x)
        return x   # sigmoid handled by BCE-with-logits loss (reference :74)


class AE(nn.Module):
    enc_dim: int = 128
    image_size: int = 128
    min_size: int = 8
    num_layers: int | None = None
    img_channels: int = 3
    channels: int = 64
    norm_name: str = 'bn'
    act_name: str = 'relu'
    up_mode: str = 'bilinear'
    output_act: str = 'tanh'
    dtype: Any = jnp.float32

    def setup(self):
        min_size, num_layers = resolve_depth(
            self.image_size, self.min_size, self.num_layers)
        self.encoder = Encoder(self.enc_dim, num_layers, self.channels,
                               self.norm_name, self.act_name, self.dtype)
        self.decoder = Decoder(num_layers, min_size, self.channels,
                               self.img_channels, self.norm_name,
                               self.act_name, self.up_mode, self.output_act,
                               self.dtype)

    def __call__(self, x, train: bool = True):
        return self.decoder(self.encoder(x, train), train)
