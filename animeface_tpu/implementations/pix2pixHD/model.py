'''pix2pixHD (reference `implementations/pix2pixHD/model.py`: coarse-to-fine
GlobalG :56 + LocalG :88, multi-scale feature-returning discriminator :140).
Flax NHWC; reflect-padded convs, instance norm.'''

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import Discriminator  # noqa: F401
# multi-scale feature D re-used from SRGAN (same structure: returns per-scale
# (logits, feats), reference pix2pixHD D :163)


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


def _rconv(x, features, kernel, stride, dtype):
    pad = kernel // 2
    mode = 'reflect' if stride == 1 else 'constant'
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding='VALID', dtype=dtype)(x)


class ResBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _rconv(x, self.channels, 3, 1, self.dtype)
        h = _inorm(self.dtype)(h)
        h = jax.nn.relu(h)
        h = _rconv(h, self.channels, 3, 1, self.dtype)
        h = _inorm(self.dtype)(h)
        return x + h


class GlobalG(nn.Module):
    out_channels: int = 3
    channels: int = 64
    num_downs: int = 3
    num_blocks: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = _rconv(x.astype(self.dtype), c, 7, 1, self.dtype)
        x = _inorm(self.dtype)(x)
        x = jax.nn.relu(x)
        for _ in range(self.num_downs):
            c *= 2
            x = _rconv(x, c, 3, 2, self.dtype)
            x = _inorm(self.dtype)(x)
            x = jax.nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResBlock(c, self.dtype)(x)
        for _ in range(self.num_downs):
            c //= 2
            x = nn.ConvTranspose(c, (3, 3), strides=(2, 2), padding='SAME',
                                 dtype=self.dtype)(x)
            x = _inorm(self.dtype)(x)
            x = jax.nn.relu(x)
        feat = x
        out = _rconv(x, self.out_channels, 7, 1, self.dtype)
        return feat, jnp.tanh(out.astype(jnp.float32))


class LocalG(nn.Module):
    out_channels: int = 3
    channels: int = 32
    num_blocks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, global_feat):
        c = self.channels
        x = _rconv(x.astype(self.dtype), c, 7, 1, self.dtype)
        x = _inorm(self.dtype)(x)
        x = jax.nn.relu(x)
        x = _rconv(x, c * 2, 3, 2, self.dtype)
        x = _inorm(self.dtype)(x)
        x = jax.nn.relu(x)
        x = x + global_feat.astype(x.dtype)
        for _ in range(self.num_blocks):
            x = ResBlock(c * 2, self.dtype)(x)
        x = nn.ConvTranspose(c, (3, 3), strides=(2, 2), padding='SAME',
                             dtype=self.dtype)(x)
        x = _inorm(self.dtype)(x)
        x = jax.nn.relu(x)
        x = _rconv(x, self.out_channels, 7, 1, self.dtype)
        return jnp.tanh(x.astype(jnp.float32))


class Generator(nn.Module):
    '''Coarse-to-fine: GlobalG on the half-res input, LocalG refines (:117).'''
    out_channels: int = 3
    channels: int = 32
    local_num_blocks: int = 3
    global_num_blocks: int = 9
    global_num_downs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        low = nn.avg_pool(x, (2, 2), strides=(2, 2))
        g_feat, g_image = GlobalG(self.out_channels, self.channels * 2,
                                  self.global_num_downs,
                                  self.global_num_blocks, self.dtype)(low)
        l_image = LocalG(self.out_channels, self.channels,
                         self.local_num_blocks, self.dtype)(x, g_feat)
        return l_image, g_image
