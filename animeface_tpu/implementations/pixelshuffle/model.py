'''pixelshuffle study (reference `implementations/pixelshuffle/model.py`):
label-conditioned generator with sub-pixel conv upsampling (UpSample :15),
DCGAN-style discriminator. LSGAN on AnimeFaceLabel.'''

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import pixel_shuffle
from animeface_tpu.implementations.DCGAN.model import (
    _channel_ladder, _n002, _bn_scale_init,
)


class UpSample(nn.Module):
    '''conv -> BN -> pixel-shuffle x2 -> PReLU (reference :15).'''
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features * 4, (3, 3), padding=1,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=0.8, dtype=self.dtype)(x)
        x = pixel_shuffle(x, 2)
        return nn.PReLU()(x)


class Generator(nn.Module):
    latent_dim: int = 100
    label_dim: int = 10
    image_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, label, train: bool = True):
        emb = nn.Embed(self.label_dim, self.latent_dim)(label)
        x = (z * emb).reshape(z.shape[0], 1, 1, self.latent_dim).astype(self.dtype)
        x = nn.ConvTranspose(1024, (4, 4), strides=(1, 1), padding='VALID',
                             use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        chans = _channel_ladder(self.image_size)[1:] + [64]
        for ch in chans:
            x = UpSample(ch, dtype=self.dtype)(x, train)
        x = nn.Conv(3, (9, 9), padding=4, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    image_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        chans = list(reversed(_channel_ladder(self.image_size)))
        x = x.astype(self.dtype)
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=_n002(),
                        dtype=self.dtype)(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 scale_init=_bn_scale_init,
                                 dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), padding='VALID', use_bias=False,
                    dtype=self.dtype)(x)
        return x.reshape(x.shape[0], -1).astype(jnp.float32)
