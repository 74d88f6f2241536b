'''VAE (reference `implementations/VAE/model.py:103`): conv encoder to
(mu, logvar), reparameterized sample, upsample-conv decoder.'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation


class ConvBlock(nn.Module):
    features: int
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)  # instance norm
        return get_activation(self.act_name)(x)


class Encoder(nn.Module):
    image_size: int = 128
    z_dim: int = 256
    in_channels: int = 3
    target_resl: int = 4
    channels: int = 32
    max_channels: int = 512
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = ConvBlock(c, self.act_name, self.dtype)(x.astype(self.dtype))
        size = self.image_size // 2
        while size > self.target_resl:
            size //= 2
            c *= 2
            x = ConvBlock(min(self.max_channels, c), self.act_name,
                          self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        mu = nn.Dense(self.z_dim, dtype=jnp.float32)(x.astype(jnp.float32))
        logvar = nn.Dense(self.z_dim, dtype=jnp.float32)(x.astype(jnp.float32))
        return mu, logvar


class Decoder(nn.Module):
    image_size: int = 128
    z_dim: int = 256
    out_channels: int = 3
    init_size: int = 4
    channels: int = 32
    max_channels: int = 512
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        num_ups = int(math.log2(self.image_size) - math.log2(self.init_size))
        ladder = [min(self.max_channels, self.channels * 2 ** i)
                  for i in reversed(range(num_ups))]
        x = nn.Dense(ladder[0] * self.init_size ** 2, dtype=self.dtype)(
            z.astype(self.dtype))
        x = x.reshape(-1, self.init_size, self.init_size, ladder[0])
        for ch in ladder:
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
            x = get_activation(self.act_name)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class VAE(nn.Module):
    image_size: int = 128
    z_dim: int = 256
    image_channels: int = 3
    channels: int = 32
    max_channels: int = 512
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.image_size, self.z_dim,
                               self.image_channels, 4, self.channels,
                               self.max_channels, self.act_name, self.dtype)
        self.decoder = Decoder(self.image_size, self.z_dim,
                               self.image_channels, 4, self.channels,
                               self.max_channels, self.act_name, self.dtype)

    def reparameterize(self, key, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(key, mu.shape)
        return eps * std + mu

    def __call__(self, x, key=None):
        mu, logvar = self.encoder(x)
        if key is None:
            key = self.make_rng('reparam')
        z = self.reparameterize(key, mu, logvar)
        recons = self.decoder(z)
        return recons, z, mu, logvar

    def decode(self, z):
        return self.decoder(z)
