'''SEBigGAN — author-original BigGAN variant with squeeze-and-excitation
gating instead of self-attention (reference `implementations/original/
SEBigGAN/model.py`, SENet :350).'''

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.BigGAN.model import (
    _arch, SNDense, SNConv, GBlock, DBlock,
)


class SqueezeExcitation(nn.Module):
    '''Global-pool channel gating (reference SENet :350).'''
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        s = jax.nn.relu(nn.Dense(max(1, C // self.reduction))(s))
        s = jax.nn.sigmoid(nn.Dense(C)(s))
        return x * s[:, None, None, :].astype(x.dtype)


class Generator(nn.Module):
    image_size: int = 128
    z_dim: int = 120
    channels: int = 64
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        gen, _ = _arch(self.image_size)
        ch = self.channels
        x = SNDense(4 * 4 * gen['inm'][0] * ch, self.use_sn,
                    dtype=self.dtype)(z.astype(self.dtype), train)
        x = x.reshape(-1, 4, 4, gen['inm'][0] * ch)
        for out_mul, resl in zip(gen['out'], gen['resl']):
            x = GBlock(out_mul * ch, True, self.use_sn, self.dtype)(x, z, train)
            x = SqueezeExcitation(dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = SNConv(3, 3, self.use_sn, dtype=self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    image_size: int = 128
    channels: int = 64
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        _, dis = _arch(self.image_size)
        ch = self.channels
        x = x.astype(self.dtype)
        for out_mul, down in zip(dis['out'], dis['down']):
            x = DBlock(out_mul * ch, down, self.use_sn, self.dtype)(x, train)
            x = SqueezeExcitation(dtype=self.dtype)(x, train)
        x = jax.nn.relu(x)
        x = jnp.sum(x, axis=(1, 2))
        return SNDense(1, self.use_sn, dtype=self.dtype)(
            x, train).astype(jnp.float32)
