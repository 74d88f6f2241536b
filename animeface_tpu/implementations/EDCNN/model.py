'''EDCNN — author-original Sobel-conv edge-enhanced colorization (reference
`implementations/original/EDCNN/model.py`: SobelConv2d :17 with 4 fixed
directional kernels under a learnable per-channel scale, style encoder +
AdaIN decoder :92-260). Reference-based line-art colorization.'''

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import Discriminator  # noqa: F401

_SOBEL = np.asarray([
    [[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]],
    [[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]],
    [[-2., -1., 0.], [-1., 0., 1.], [0., 1., 2.]],
    [[0., 1., 2.], [-1., 0., 1.], [-2., -1., 0.]],
], np.float32)


class SobelConv(nn.Module):
    '''Fixed Sobel bank x learnable scale; output concat with input (:17).'''
    out_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.out_channels % 4 == 0
        in_ch = x.shape[-1]
        groups = self.out_channels // 4
        scale = self.param('scale', nn.initializers.ones_init(),
                           (1, 1, in_ch, self.out_channels))
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.out_channels,))
        # HWIO kernel: each output channel applies one of the 4 sobel kernels
        kern = np.stack([_SOBEL[i % 4] for i in range(self.out_channels)],
                        axis=-1)                       # [3,3,out]
        kern = np.repeat(kern[:, :, None, :], in_ch, axis=2)  # [3,3,in,out]
        w = jnp.asarray(kern) * scale
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = y + bias.astype(y.dtype)
        return jnp.concatenate([x.astype(y.dtype), y], axis=-1)


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


class AdaIN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        C = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        gb = nn.Dense(C * 2)(style.astype(jnp.float32))
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return xn * (1 + gamma[:, None, None, :]).astype(x.dtype) \
            + beta[:, None, None, :].astype(x.dtype)


class Generator(nn.Module):
    image_size: int = 128
    sketch_channels: int = 1
    style_dim: int = 256
    channels: int = 32
    bottom: int = 32
    num_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sketch, ref):
        num = int(math.log2(self.image_size) - math.log2(self.bottom))

        # style encoder over the reference image
        c = self.channels
        s = nn.Conv(c, (7, 7), padding=3, dtype=self.dtype)(
            ref.astype(self.dtype))
        s = jax.nn.leaky_relu(s, 0.2)
        size = self.image_size
        while size > 8:
            size //= 2
            c *= 2
            s = nn.Conv(min(512, c), (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype)(s)
            s = jax.nn.leaky_relu(s, 0.2)
        s = jnp.mean(s, axis=(1, 2)).astype(jnp.float32)
        style = nn.Dense(self.style_dim)(s)

        # sketch encoder with sobel input
        x = SobelConv(self.channels, self.dtype)(sketch)
        c2 = self.channels
        for _ in range(num):
            c2 *= 2
            x = nn.Conv(c2, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype)(x)
            x = _inorm(self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)

        # AdaIN decoder
        for _ in range(self.num_blocks):
            h = nn.Conv(c2, (3, 3), padding=1, dtype=self.dtype)(x)
            h = AdaIN(self.dtype)(h, style)
            h = jax.nn.leaky_relu(h, 0.2)
            x = (x + h) / np.sqrt(2)
        for _ in range(num):
            c2 //= 2
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = nn.Conv(c2, (3, 3), padding=1, dtype=self.dtype)(x)
            x = AdaIN(self.dtype)(x, style)
            x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(3, (7, 7), padding=3, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))
