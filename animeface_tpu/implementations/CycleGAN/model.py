'''CycleGAN (reference `implementations/CycleGAN/model.py`): ResNet
encoder-bottleneck-decoder generator with reflect-padded convs (:77), patch
discriminator (:141), both with the reference's norm/act/sn/bias knobs
(Conv2d SN wrapper :27). Flax NHWC; SN and running-stat norms live in the
'batch_stats' collection, updated under train=True.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module.layers import get_activation


def _norm(name, dtype, train=True):
    if name == '':
        return lambda x: x
    if name == 'in':
        return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)
    if name == 'bn':
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=dtype)
    raise Exception(f'norm: {name}')


class ReflectConv(nn.Module):
    '''Reflect-padded conv with optional spectral norm.'''
    features: int
    kernel_size: int = 3
    strides: int = 1
    use_sn: bool = False
    use_bias: bool = True
    reflect: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.kernel_size // 2
        if self.reflect and pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        mode='reflect')
            padding = 'VALID'
        else:
            padding = ((pad, pad), (pad, pad))
        conv = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       strides=(self.strides, self.strides), padding=padding,
                       use_bias=self.use_bias, dtype=self.dtype)
        if self.use_sn:
            return nn.SpectralNorm(conv)(x, update_stats=train)
        return conv(x)


class ResBlock(nn.Module):
    channels: int
    num_conv: int = 2
    norm_name: str = 'in'
    act_name: str = 'relu'
    use_sn: bool = False
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.act_name)
        h = x
        for _ in range(self.num_conv):
            h = ReflectConv(self.channels, 3, 1, self.use_sn, self.use_bias,
                            dtype=self.dtype)(h, train)
            h = _norm(self.norm_name, self.dtype, train)(h)
            h = act(h)
        return x + h


class Generator(nn.Module):
    image_size: int = 128
    in_channels: int = 3
    out_channels: int = 3
    target_resl: int = 32     # reference downsample_to
    channels: int = 32
    max_channels: int = 1024
    num_blocks: int = 6
    block_num_conv: int = 2
    norm_name: str = 'in'
    act_name: str = 'relu'
    use_sn: bool = False
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.act_name)
        num_downs = max(0, int(np.log2(self.image_size)
                               - np.log2(self.target_resl)))
        c = och = self.channels
        x = ReflectConv(c, 7, 1, self.use_sn, self.use_bias,
                        dtype=self.dtype)(x.astype(self.dtype), train)
        x = _norm(self.norm_name, self.dtype, train)(x)
        x = act(x)
        for _ in range(num_downs):
            c *= 2
            och = min(self.max_channels, c)
            x = ReflectConv(och, 3, 2, self.use_sn, self.use_bias,
                            dtype=self.dtype)(x, train)
            x = _norm(self.norm_name, self.dtype, train)(x)
            x = act(x)
        for _ in range(self.num_blocks):
            x = ResBlock(och, self.block_num_conv, self.norm_name,
                         self.act_name, self.use_sn, self.use_bias,
                         self.dtype)(x, train)
        for _ in range(num_downs):
            c //= 2
            och = min(self.max_channels, c)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = ReflectConv(och, 3, 1, self.use_sn, self.use_bias,
                            dtype=self.dtype)(x, train)
            x = _norm(self.norm_name, self.dtype, train)(x)
            x = act(x)
        x = ReflectConv(self.out_channels, 7, 1, self.use_sn, self.use_bias,
                        dtype=self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    '''PatchGAN discriminator (:141).'''
    channels: int = 32
    num_layers: int = 3
    norm_name: str = 'in'
    act_name: str = 'relu'
    use_sn: bool = False
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.act_name)
        c = self.channels
        x = ReflectConv(c, 4, 2, self.use_sn, self.use_bias, False,
                        self.dtype)(x.astype(self.dtype), train)
        x = act(x)
        for i in range(self.num_layers - 1):
            c *= 2
            stride = 2 if i < self.num_layers - 2 else 1
            x = ReflectConv(c, 4, stride, self.use_sn, self.use_bias, False,
                            self.dtype)(x, train)
            x = _norm(self.norm_name, self.dtype, train)(x)
            x = act(x)
        x = ReflectConv(1, 4, 1, self.use_sn, self.use_bias, False,
                        self.dtype)(x, train)
        return x.astype(jnp.float32)
