'''ConvNeXt-ified GAN (reference `implementations/ConvNeXt/model.py`:
ConvNeXtBlock :22, ConvNextBlockFlex ablation study :45, BLOCKS table :99,
Stage :120, Generator :132, Discriminator :171). Flax NHWC; depthwise
convs + pointwise expansion with zero-init gamma residual scaling.

Reference quirk kept: 'ln' is GroupNorm(1, C) — normalization over
(C, H, W) jointly — everywhere except the D head's flatten LayerNorm
(reference model.py:12 vs :201).'''

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation


def _norm(name, c, dtype):
    if name == 'bn':
        # the reference BLOCKS table only reaches 'bn' through the ablation
        # block types; stateless batch norm keeps the study runnable
        return lambda x: _instance_batch_norm(x, dtype)
    if name == 'in':
        return nn.GroupNorm(num_groups=c, use_bias=False, use_scale=False,
                            dtype=dtype)
    if name == 'ln':
        return nn.GroupNorm(num_groups=1, dtype=dtype)
    if name == 'gn':
        return nn.GroupNorm(num_groups=32, dtype=dtype)
    raise Exception(f'normalization: {name}')


def _instance_batch_norm(x, dtype):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dtype)


#: reference BLOCKS (model.py:99-117) — the ConvNeXt-paper ablation ladder
BLOCKS = {
    'resnext': dict(norm_name='bn', act_name='relu', invert=False,
                    input_dconv=False, large_kernel=False, fewer_act=False,
                    fewer_norm=False),
    'invert': dict(norm_name='bn', act_name='relu', invert=True,
                   input_dconv=False, large_kernel=False, fewer_act=False,
                   fewer_norm=False),
    'kernel': dict(norm_name='bn', act_name='gelu', invert=True,
                   input_dconv=True, large_kernel=True, fewer_act=False,
                   fewer_norm=False),
    'gelu': dict(norm_name='bn', act_name='gelu', invert=True,
                 input_dconv=True, large_kernel=True, fewer_act=False,
                 fewer_norm=False),
    'fewact': dict(norm_name='bn', act_name='gelu', invert=True,
                   input_dconv=True, large_kernel=True, fewer_act=True,
                   fewer_norm=False),
    'fewnorm': dict(norm_name='bn', act_name='gelu', invert=True,
                    input_dconv=True, large_kernel=True, fewer_act=True,
                    fewer_norm=True),
    'convnext': dict(norm_name='ln', act_name='gelu', invert=True,
                     input_dconv=True, large_kernel=True, fewer_act=True,
                     fewer_norm=True),
    'smallkernel': dict(norm_name='ln', act_name='gelu', invert=True,
                        input_dconv=True, large_kernel=False, fewer_act=True,
                        fewer_norm=True),
}


class ConvNeXtBlock(nn.Module):
    '''The fixed D block (reference ConvNeXtBlock :22): dw7x7 -> 'ln' norm ->
    1x1 expand -> gelu -> 1x1, zero-init gamma residual.'''
    channels: int
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.Conv(self.channels, (7, 7), padding=3,
                    feature_group_count=self.channels, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=1, dtype=self.dtype)(x)
        x = nn.Conv(self.channels * self.expansion, (1, 1),
                    dtype=self.dtype)(x)
        x = jax.nn.gelu(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        gamma = self.param('gamma', nn.initializers.zeros_init(), ())
        return residual + x * gamma.astype(x.dtype)


class ConvNextBlockFlex(nn.Module):
    '''Reference ConvNextBlockFlex (:45) — the block-structure ablation.'''
    channels: int
    ratio: int = 4
    norm_name: str = 'bn'
    act_name: str = 'relu'
    invert: bool = False
    input_dconv: bool = False
    large_kernel: bool = False
    fewer_act: bool = False
    fewer_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = self.channels
        mid = C * self.ratio if self.invert else C // self.ratio
        k = 7 if self.large_kernel else 3
        act = get_activation(self.act_name)
        residual = x

        if self.input_dconv:
            x = nn.Conv(C, (k, k), padding=k // 2, feature_group_count=C,
                        dtype=self.dtype)(x)
            x = _norm(self.norm_name, C, self.dtype)(x)
            if not self.fewer_act:
                x = act(x)
            x = nn.Conv(mid, (1, 1), dtype=self.dtype)(x)
        else:
            x = nn.Conv(mid, (1, 1), dtype=self.dtype)(x)
            x = _norm(self.norm_name, mid, self.dtype)(x)
            if not self.fewer_act:
                x = act(x)
            x = nn.Conv(mid, (k, k), padding=k // 2, feature_group_count=mid,
                        dtype=self.dtype)(x)
        if not self.fewer_norm:
            x = _norm(self.norm_name, mid, self.dtype)(x)
        x = act(x)
        x = nn.Conv(C, (1, 1), dtype=self.dtype)(x)
        if not self.fewer_norm:
            x = _norm(self.norm_name, C, self.dtype)(x)
        gamma = self.param('gamma', nn.initializers.zeros_init(), ())
        x = residual + x * gamma.astype(x.dtype)
        if not self.fewer_act:
            x = act(x)
        return x


class Generator(nn.Module):
    '''Reference Generator (:132): Linear input, per-scale Stage =
    norm -> up2x -> conv3x3 -> flex blocks (:120), normed tanh output.'''
    latent_dim: int = 128
    image_size: int = 128
    bottom: int = 4
    channels: int = 96
    max_channels: int | None = None
    block_type: str = 'convnext'
    blocks_per_scale: int = 2
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        num_ups = int(math.log2(self.image_size) - math.log2(self.bottom))
        max_c = self.max_channels if self.max_channels is not None \
            else self.channels * 16
        bk = BLOCKS[self.block_type]
        c = self.channels * 2 ** num_ups
        och = min(max_c, c)

        x = nn.Dense(och * self.bottom ** 2, dtype=self.dtype)(
            z.astype(self.dtype))
        x = get_activation(bk['act_name'])(x)
        x = x.reshape(-1, self.bottom, self.bottom, och)
        for _ in range(num_ups):
            c //= 2
            ich, och = och, min(max_c, c)
            x = _norm(bk['norm_name'], ich, self.dtype)(x)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = nn.Conv(och, (3, 3), padding=1, dtype=self.dtype)(x)
            for _ in range(self.blocks_per_scale):
                x = ConvNextBlockFlex(och, 4, dtype=self.dtype, **bk)(x)
        if self.block_type in ('convnext', 'fewnorm'):
            x = _norm(bk['norm_name'], och, self.dtype)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    '''Reference Discriminator (:171): ConvNeXt-T classifier trunk.'''
    in_channels: int = 3
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(len(self.depths)):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                            padding='VALID', dtype=self.dtype)(x)
                x = nn.GroupNorm(num_groups=1, epsilon=1e-6,
                                 dtype=self.dtype)(x)
            else:
                x = nn.GroupNorm(num_groups=1, epsilon=1e-6,
                                 dtype=self.dtype)(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2),
                            padding='VALID', dtype=self.dtype)(x)
            for _ in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        return nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))
