'''SRGAN (reference `implementations/SRGAN/model.py`): residual G with
pixel-shuffle upsampling (:56,70), multi-scale patch discriminator (:118,152).
Flax NHWC; pixel shuffle = depth-to-space reshape; spectral norm optional.
'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def pixel_shuffle(x, factor: int = 2):
    '''[N,H,W,C*r^2] -> [N,H*r,W*r,C] (torch PixelShuffle semantics).'''
    N, H, W, C = x.shape
    r = factor
    c = C // (r * r)
    x = x.reshape(N, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(N, H * r, W * r, c)


class MaybeSNConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = 'SAME'
    sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       strides=(self.strides, self.strides),
                       padding=self.padding, use_bias=self.use_bias,
                       kernel_init=nn.initializers.xavier_normal(),
                       dtype=self.dtype)
        if self.sn:
            return nn.SpectralNorm(conv)(x, update_stats=train)
        return conv(x)


def _act(name):
    if name == 'prelu':
        return nn.PReLU()
    if name == 'lrelu':
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name == 'relu':
        return jax.nn.relu
    if name == 'tanh':
        return jnp.tanh
    raise Exception(f'act: {name}')


def _norm(name, dtype, train=True):
    '''reference get_normalization; '' means no norm (ESRGAN G).'''
    if name == '':
        return lambda x: x
    if name == 'in':
        return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)
    if name == 'bn':
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=dtype)
    raise Exception(f'norm: {name}')


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


class ResBlock(nn.Module):
    '''norm-act-conv x2 residual (reference Block :39 wrapped in Res :31).'''
    channels: int
    sn: bool = True
    act_name: str = 'prelu'
    norm_name: str = 'in'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _norm(self.norm_name, self.dtype, train)(x)
        h = _act(self.act_name)(h)
        h = MaybeSNConv(self.channels, 3, sn=self.sn, use_bias=self.use_bias,
                        dtype=self.dtype)(h, train)
        h = _norm(self.norm_name, self.dtype, train)(h)
        h = _act(self.act_name)(h)
        h = MaybeSNConv(self.channels, 3, sn=self.sn, use_bias=self.use_bias,
                        dtype=self.dtype)(h, train)
        return x + h


class Generator(nn.Module):
    scale: int = 2
    image_channels: int = 3
    channels: int = 64
    num_blocks: int = 5
    sn: bool = True
    act_name: str = 'prelu'
    norm_name: str = 'in'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_ups = int(np.log2(self.scale))
        x = MaybeSNConv(self.channels, 7, sn=self.sn, use_bias=self.use_bias,
                        dtype=self.dtype)(x.astype(self.dtype), train)
        t = x
        for _ in range(self.num_blocks):
            x = ResBlock(self.channels, self.sn, self.act_name,
                         self.norm_name, self.use_bias, self.dtype)(x, train)
        x = _norm(self.norm_name, self.dtype, train)(x)
        x = _act(self.act_name)(x)
        x = MaybeSNConv(self.channels, 3, sn=self.sn, use_bias=self.use_bias,
                        dtype=self.dtype)(x, train)
        x = x + t
        for _ in range(num_ups):
            x = _act(self.act_name)(x)
            x = MaybeSNConv(self.channels * 4, 3, sn=self.sn,
                            use_bias=self.use_bias, dtype=self.dtype)(x, train)
            x = pixel_shuffle(x, 2)
        x = _act(self.act_name)(x)
        x = MaybeSNConv(self.image_channels, 7, sn=self.sn,
                        use_bias=self.use_bias, dtype=self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


class SingleScaleDiscriminator(nn.Module):
    num_layers: int = 3
    channels: int = 32
    sn: bool = True
    act_name: str = 'lrelu'
    norm_name: str = 'in'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = []
        c = self.channels
        x = MaybeSNConv(c, 4, 2, ((1, 1), (1, 1)), self.sn, self.use_bias,
                        dtype=self.dtype)(x.astype(self.dtype), train)
        x = _act(self.act_name)(x)
        feats.append(x)
        for _ in range(self.num_layers):
            c *= 2
            x = MaybeSNConv(c, 4, 2, ((1, 1), (1, 1)), self.sn,
                            self.use_bias, dtype=self.dtype)(x, train)
            x = _norm(self.norm_name, self.dtype, train)(x)
            x = _act(self.act_name)(x)
            feats.append(x)
        logits = MaybeSNConv(1, 4, 1, ((1, 1), (1, 1)), self.sn,
                             self.use_bias, dtype=self.dtype)(x, train)
        return logits.astype(jnp.float32), feats


class Discriminator(nn.Module):
    '''Multi-scale patch D: evaluates at full + avg-pooled scales (:152).'''
    num_scale: int = 2
    num_layers: int = 3
    channels: int = 32
    sn: bool = True
    act_name: str = 'lrelu'
    norm_name: str = 'in'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        outs = []
        for _ in range(self.num_scale):
            outs.append(SingleScaleDiscriminator(
                self.num_layers, self.channels, self.sn, self.act_name,
                self.norm_name, self.use_bias, self.dtype)(x, train))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return outs
