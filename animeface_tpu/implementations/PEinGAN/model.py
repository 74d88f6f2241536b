'''PEinGAN (reference `implementations/PEinGAN/model.py`): "Positional
Encoding as Spatial Inductive Bias in GANs" — a StyleGAN2-style generator
whose constant input is replaced by a 2D sinusoidal positional embedding grid
(SPE2d, :240), enabling padding-free multi-scale synthesis: the SPE grid is
generated at any requested bottom size and the same convs synthesize larger /
smaller images. D uses a mean-pool epilogue so one parameter set covers all
training scales (the reference's flatten-Dense epilogue pins the size).'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.StyleGAN2.model import (
    ELRDense, ELRConv, ModulatedConv, InjectNoise, Mapping, MiniBatchStdDev,
    DBlock, StyleBlock, ToImage,
)


def spe2d(height: int, width: int, embedding_dim: int):
    '''2D sinusoidal positional embedding [H, W, 2*embedding_dim] (ref :240):
    row and column 1-D SPEs concatenated channel-wise.'''
    half = embedding_dim // 2
    freq = np.exp(np.arange(half) * (-np.log(10000.0) / (half - 1)))

    def spe1d(n):
        pos = np.arange(1, n + 1)[:, None] * freq[None, :]
        return np.concatenate([np.sin(pos), np.cos(pos)], axis=1)  # [n, dim]

    row = spe1d(height)[:, None, :]       # [H,1,dim]
    col = spe1d(width)[None, :, :]        # [1,W,dim]
    grid = np.concatenate([
        np.broadcast_to(row, (height, width, embedding_dim)),
        np.broadcast_to(col, (height, width, embedding_dim)),
    ], axis=-1)
    return jnp.asarray(grid, jnp.float32)


class Generator(nn.Module):
    '''StyleGAN2 synthesis over an SPE2d input grid; `bottom` selects the
    synthesis scale (static per compiled step).'''
    image_size: int = 128
    style_dim: int = 512
    channels: int = 32
    max_channels: int = 512
    map_num_layers: int = 8
    map_lr: float = 0.01
    embed_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, bottom: int = 4):
        num_ups = int(np.log2(self.image_size)) - 2
        chans = self.channels * 2 ** num_ups
        ladder = [min(self.max_channels, chans // 2 ** i)
                  for i in range(num_ups + 1)]

        w = Mapping(self.style_dim, self.map_num_layers, True,
                    self.map_lr)(z)
        grid = spe2d(bottom, bottom, self.embed_dim)
        x = jnp.broadcast_to(grid[None], (z.shape[0],) + grid.shape)
        x = x.astype(self.dtype)
        x = ModulatedConv(ladder[0], 3, dtype=self.dtype)(x, w)
        x = InjectNoise()(x)
        x = jax.nn.leaky_relu(x, 0.2)
        pre = ToImage(3, upsample=True, dtype=self.dtype)(x, w)
        image = pre
        for i, ch in enumerate(ladder[1:]):
            last = i == num_ups - 1
            x = StyleBlock(ch, 2, dtype=self.dtype)(x, w)
            image = ToImage(3, upsample=not last, dtype=self.dtype)(x, w, pre)
            pre = image
        return jnp.tanh(image.astype(jnp.float32)), w


class Discriminator(nn.Module):
    '''Residual D with size-agnostic mean-pool epilogue.'''
    image_size: int = 128
    channels: int = 32
    max_channels: int = 512
    mbsd_groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        chans = self.channels
        x = ELRConv(chans, 1, dtype=self.dtype)(x.astype(self.dtype))
        x = jax.nn.leaky_relu(x, 0.2)
        resl = self.image_size
        och = chans
        while resl > 4:
            resl //= 2
            chans *= 2
            och = min(self.max_channels, chans)
            x = DBlock(och, 2, dtype=self.dtype)(x)
        x = MiniBatchStdDev(self.mbsd_groups)(x)
        x = ELRConv(och, 3, dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = jnp.mean(x, axis=(1, 2))        # size-agnostic
        x = ELRDense(och, dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        return ELRDense(1, dtype=self.dtype)(x).astype(jnp.float32)
