'''Visual Attention Network GAN (reference `implementations/VAN/model.py`:
AttentionModule :23 — large-kernel attention as depthwise 5x5 + dilated
depthwise 7x7 + pointwise gating — Block :47, Stage :66, Generator :80,
PatchEmbed :117, Discriminator :140). Flax NHWC.

Reference quirk kept: 'ln' is GroupNorm(1, C) over (C, H, W) jointly
(reference model.py:16), 'gn' is GroupNorm(16).'''

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation


def _norm(name, c, dtype):
    if name == 'ln':
        return nn.GroupNorm(num_groups=1, dtype=dtype)
    if name == 'gn':
        return nn.GroupNorm(num_groups=16, dtype=dtype)
    if name == 'in':
        return nn.GroupNorm(num_groups=c, use_bias=False, use_scale=False,
                            dtype=dtype)
    raise Exception(f'Normalization: {name} (bn unsupported in the TPU port)')


class AttentionModule(nn.Module):
    '''LKA gate (reference :23).'''
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn = nn.Conv(self.channels, (5, 5), padding=2,
                       feature_group_count=self.channels, dtype=self.dtype)(x)
        attn = nn.Conv(self.channels, (7, 7), padding=9, kernel_dilation=3,
                       feature_group_count=self.channels, dtype=self.dtype)(attn)
        attn = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(attn)
        return x * attn


class Block(nn.Module):
    channels: int
    expansion: int = 4
    norm_name: str = 'ln'
    act_name: str = 'gelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.param('layer_scale1',
                        nn.initializers.constant(1e-6), ())
        s2 = self.param('layer_scale2',
                        nn.initializers.constant(1e-6), ())
        h = _norm(self.norm_name, self.channels, self.dtype)(x)
        x = x + s1.astype(x.dtype) * AttentionModule(self.channels,
                                                     self.dtype)(h)
        h = _norm(self.norm_name, self.channels, self.dtype)(x)
        h = nn.Conv(self.channels * self.expansion, (1, 1),
                    dtype=self.dtype)(h)
        h = get_activation(self.act_name)(h)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(h)
        return x + s2.astype(x.dtype) * h


class Generator(nn.Module):
    '''Reference Generator (:80): Linear input, Stage = [norm] -> up2x ->
    conv3x3 -> blocks (first stage skips the pre-norm), normed tanh out.'''
    latent_dim: int = 128
    image_size: int = 128
    bottom: int = 4
    channels: int = 64
    max_channels: int | None = None
    blocks_per_scale: int = 2
    out_channels: int = 3
    norm_name: str = 'ln'
    act_name: str = 'gelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        num_ups = int(math.log2(self.image_size) - math.log2(self.bottom))
        max_c = self.max_channels if self.max_channels is not None \
            else self.channels * 16
        c = self.channels * 2 ** num_ups
        och = min(max_c, c)
        x = nn.Dense(och * self.bottom ** 2, dtype=self.dtype)(
            z.astype(self.dtype))
        x = get_activation(self.act_name)(x)
        x = x.reshape(-1, self.bottom, self.bottom, och)
        for i in range(num_ups):
            if i > 0:
                x = _norm(self.norm_name, x.shape[-1], self.dtype)(x)
            c //= 2
            och = min(max_c, c)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = nn.Conv(och, (3, 3), padding=1, dtype=self.dtype)(x)
            for _ in range(self.blocks_per_scale):
                x = Block(och, 4, self.norm_name, self.act_name,
                          dtype=self.dtype)(x)
        x = _norm(self.norm_name, och, self.dtype)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    '''Reference Discriminator (:140): PatchEmbed stages (7/4 stem, 3/2
    downs) with the channels*2^i ladder, norm -> avgpool -> fc head.'''
    layers: Sequence[int] = (3, 3, 9, 3)
    channels: int = 64
    max_channels: int | None = None
    in_channels: int = 3
    norm_name: str = 'ln'
    act_name: str = 'gelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        max_c = self.max_channels if self.max_channels is not None \
            else self.channels * 16
        c = self.channels
        och = c
        for i, depth in enumerate(self.layers):
            c *= 2
            och = min(max_c, c)
            if i == 0:
                x = nn.Conv(och, (7, 7), strides=(4, 4), padding=3,
                            dtype=self.dtype)(x)
            else:
                x = nn.Conv(och, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype)(x)
            x = _norm(self.norm_name, och, self.dtype)(x)
            for _ in range(depth):
                x = Block(och, 4, self.norm_name, self.act_name,
                          dtype=self.dtype)(x)
        x = _norm(self.norm_name, och, self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))
