'''Layer helpers (reference `nnutils/module/layers.py`): activation / normalization
lookup, MiniBatchStdDev, spectral-norm wrappers — as Flax NHWC modules.
'''

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_activation(name: str, inplace: bool = True) -> Callable:
    '''Name -> activation callable (reference layers.py:8).

    `inplace` is accepted for API parity and ignored (XLA fuses elementwise ops).
    '''
    if name == 'relu':
        return jax.nn.relu
    if name in ('lrelu', 'leakyrelu'):
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name == 'tanh':
        return jnp.tanh
    if name == 'gelu':
        return jax.nn.gelu
    if name in ('swish', 'silu'):
        return jax.nn.silu
    if name == 'prelu':
        return nn.PReLU()
    if name == 'sigmoid':
        return jax.nn.sigmoid
    raise Exception(f'activation: {name}')


def get_normalization(name: str, channels: int, **kwargs) -> nn.Module:
    '''Name -> norm module over NHWC feature maps (reference layers.py:22).

    'in' is affine-free, matching torch `InstanceNorm2d(channels)`'s
    `affine=False` default (the reference never passes affine); pass
    `use_bias=True, use_scale=True` for an affine instance norm.
    '''
    if name == 'in':
        kwargs.setdefault('use_bias', False)
        kwargs.setdefault('use_scale', False)
        kwargs.setdefault('epsilon', 1e-5)
        return nn.GroupNorm(num_groups=channels, **kwargs)
    if name == 'bn':
        return nn.BatchNorm(use_running_average=False, momentum=0.9, **kwargs)
    if name == 'ln':
        return nn.LayerNorm(**kwargs)
    if name == 'gn':
        return nn.GroupNorm(**kwargs)
    raise Exception(f'normalization: {name}')


class MiniBatchStdDev(nn.Module):
    '''Append a cross-sample stddev statistic as an extra feature map.

    Reference `nnutils/module/layers.py:30` / `implementations/StyleGAN2/model.py:215`.
    NHWC. Sharding choice (SURVEY §2.5, deliberate): `grouping='strided'`
    (default) keeps the reference's torch `reshape(G, -1, ...)` semantics —
    group m holds samples {m, m+N/G, ...} of the GLOBAL batch, which under a
    sharded batch axis makes every group span all devices (GSPMD inserts a
    gather). `grouping='contiguous'` groups adjacent samples {mG..mG+G-1}:
    statistically identical, and communication-free whenever group_size
    divides the per-device batch — prefer it for multi-chip runs.
    '''
    group_size: int = 4
    num_features: int = 1
    eps: float = 1e-8
    grouping: str = 'strided'

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        G = min(self.group_size, N)
        F = self.num_features
        y = x.astype(jnp.float32)
        if self.grouping == 'strided':
            # [G, N/G, H, W, F, C/F]
            y = y.reshape(G, N // G, H, W, F, C // F)
            red_axis, rep = 0, lambda s: jnp.tile(s, (G, 1))
        else:
            y = y.reshape(N // G, G, H, W, F, C // F)
            red_axis, rep = 1, lambda s: jnp.repeat(s, G, axis=0)
        y = y - jnp.mean(y, axis=red_axis, keepdims=True)
        y = jnp.sqrt(jnp.mean(y * y, axis=red_axis) + self.eps)  # [N/G,H,W,F,C/F]
        y = jnp.mean(y, axis=(1, 2, 4))                    # [N/G, F]
        y = rep(y).astype(x.dtype)                         # [N, F]
        y = jnp.broadcast_to(y[:, None, None, :], (N, H, W, F))
        return jnp.concatenate([x, y], axis=-1)


class SNConv2d(nn.Module):
    '''Spectral-normalized conv (reference SNConv2d, layers.py:58).'''
    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = 'SAME'
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        conv = nn.SpectralNorm(nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=self.padding, use_bias=self.use_bias))
        return conv(x, update_stats=update_stats)


class SNLinear(nn.Module):
    '''Spectral-normalized dense layer.'''
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        dense = nn.SpectralNorm(nn.Dense(self.features, use_bias=self.use_bias))
        return dense(x, update_stats=update_stats)


class SNConvTranspose2d(nn.Module):
    '''Spectral-normalized transposed conv.'''
    features: int
    kernel_size: tuple = (4, 4)
    strides: tuple = (2, 2)
    padding: Any = 'SAME'
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        conv = nn.SpectralNorm(nn.ConvTranspose(
            self.features, self.kernel_size, strides=self.strides,
            padding=self.padding, use_bias=self.use_bias))
        return conv(x, update_stats=update_stats)
