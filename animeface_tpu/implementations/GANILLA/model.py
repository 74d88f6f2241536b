'''GANILLA (reference `implementations/GANILLA/model.py`): illustration-style
I2I — encoder blocks concatenate their input with the conv branch before a
fusion conv (Block :29), decoder sums upsampled features with projected
encoder skips (Decoder :124). Patch D returning per-layer features.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


def _rconv(x, features, kernel, stride, dtype, pad=None):
    p = pad if pad is not None else kernel // 2
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode='reflect')
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding='VALID', use_bias=True, dtype=dtype)(x)


class Block(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _rconv(x, self.features, 3, self.strides, self.dtype)
        h = _inorm(self.dtype)(h)
        h = jax.nn.leaky_relu(h, 0.2)
        h = _rconv(h, self.features, 3, 1, self.dtype)
        h = _inorm(self.dtype)(h)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.strides,) * 2,
                        dtype=self.dtype)(x)
            x = _inorm(self.dtype)(x)
        out = _rconv(jnp.concatenate([h, x], axis=-1), self.features, 3, 1,
                     self.dtype)
        out = _inorm(self.dtype)(out)
        return jax.nn.leaky_relu(out, 0.2)


class Generator(nn.Module):
    image_size: int = 128
    image_channels: int = 3
    out_channels: int = 3
    bottom_width: int = 8
    num_feats: int = 3
    channels: int = 32
    hid_channels: int = 128
    layer_num_blocks: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_downs = int(np.log2(self.image_size) - np.log2(self.bottom_width))
        c = self.channels
        x = _rconv(x.astype(self.dtype), c, 7, 1, self.dtype, pad=3)
        x = _inorm(self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        feats = [x]
        for i in range(num_downs):
            c *= 2
            stride = 1 if i == 0 else 2
            for j in range(self.layer_num_blocks):
                x = Block(c, stride if j == 0 else 1, self.dtype)(x)
            feats.append(x)
        skips = feats[-(self.num_feats + 1):-1]

        # decoder
        h = _rconv(x, self.hid_channels, 3, 1, self.dtype)
        N, H, W, C = h.shape
        h = jax.image.resize(h, (N, H * 2, W * 2, C), method='nearest')
        for feat in reversed(skips):
            f = _rconv(feat, self.hid_channels, 3, 1, self.dtype)
            h = h + f
            N, H, W, C = h.shape
            h = jax.image.resize(h, (N, H * 2, W * 2, C), method='nearest')
        out = _rconv(h, self.out_channels, 7, 1, self.dtype, pad=3)
        return jnp.tanh(out.astype(jnp.float32))


class Discriminator(nn.Module):
    num_layers: int = 3
    channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        c = self.channels
        x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x.astype(self.dtype))
        x = jax.nn.leaky_relu(x, 0.2)
        feats.append(x)
        for _ in range(self.num_layers):
            c *= 2
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(x)
            x = _inorm(self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
            feats.append(x)
        logits = nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)),
                         dtype=self.dtype)(x)
        return logits.astype(jnp.float32), feats
