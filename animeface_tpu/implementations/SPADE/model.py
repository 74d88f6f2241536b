'''SPADE (reference `implementations/SPADE/model.py`: SPADE :42 — spatially-
adaptive denormalization from the semantic map — SPADEResBlock :68,
Generator :117, VAE-style Encoder :223). Multi-scale feature D reused from
SRGAN. Flax NHWC.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import Discriminator  # noqa: F401


def _inorm_na(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                        use_scale=False, dtype=dtype)


class SPADE(nn.Module):
    '''norm(x) * gamma(seg) + beta(seg) (reference :42).'''
    hidden_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, seg):
        C = x.shape[-1]
        norm = _inorm_na(self.dtype)(x)
        seg = jax.image.resize(seg, x.shape[:3] + (seg.shape[-1],),
                               method='nearest').astype(x.dtype)
        h = nn.Conv(self.hidden_channels, (3, 3), padding=1,
                    dtype=self.dtype)(seg)
        h = jax.nn.relu(h)
        gamma = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype)(h)
        beta = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype)(h)
        return gamma * norm + beta


class SPADEResBlock(nn.Module):
    features: int
    num_conv: int = 2
    hidden_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, seg):
        in_ch = x.shape[-1]
        h = x
        ch = in_ch
        for i in range(self.num_conv):
            h = SPADE(self.hidden_channels, self.dtype)(h, seg)
            h = jax.nn.leaky_relu(h, 0.2)
            h = nn.Conv(self.features, (3, 3), padding=1,
                        dtype=self.dtype)(h)
            ch = self.features
        if in_ch != self.features:
            t = SPADE(self.hidden_channels, self.dtype)(x, seg)
            t = jax.nn.leaky_relu(t, 0.2)
            x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(t)
        return x + h


class Generator(nn.Module):
    image_size: int = 128
    z_dim: int = 256
    in_channels: int = 1      # semantic-map channels
    out_channels: int = 3
    channels: int = 32
    max_channels: int = 1024
    block_num_conv: int = 2
    spade_hidden_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, seg):
        num_ups = int(np.log2(self.image_size) - 2)
        c = self.channels * 2 ** num_ups
        och = min(self.max_channels, c)
        x = nn.Dense(och * 16, dtype=self.dtype)(z.astype(self.dtype))
        x = x.reshape(-1, 4, 4, och)
        for _ in range(num_ups):
            c //= 2
            och = min(self.max_channels, c)
            x = SPADEResBlock(och, self.block_num_conv,
                              self.spade_hidden_channels, self.dtype)(x, seg)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Encoder(nn.Module):
    '''VAE-style image encoder for style z (reference :223).'''
    image_size: int = 128
    z_dim: int = 256
    channels: int = 32
    max_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, key):
        c = self.channels
        size = self.image_size // 2
        x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x.astype(self.dtype))
        x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        while size > 4:
            size //= 2
            c *= 2
            x = nn.Conv(min(self.max_channels, c), (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=None, group_size=1,
                             dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        mu = nn.Dense(self.z_dim)(x)
        logvar = nn.Dense(self.z_dim)(x)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        return z, mu, logvar
