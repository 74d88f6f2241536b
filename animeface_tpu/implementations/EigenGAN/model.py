'''EigenGAN (reference `implementations/EigenGAN/model.py`): layer-wise
learned linear subspaces (Subspace :32 with orthonormal basis U, importance
L, offset mu) injected into an upsampling generator (Layer :68, Generator
:107); conv D with paired stride-1/stride-2 blocks (DiscConvBlock :147,
Discriminator :164). Full reference knob surface: per-network sn / bias /
norm_name / act_name.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module.layers import (
    get_activation, get_normalization,
)


class Subspace(nn.Module):
    '''x = sum_n (L_n * z_n) * U_n + mu (reference :32).'''
    latent_dim: int
    channels: int
    resolution: int

    @nn.compact
    def __call__(self, z):
        U = self.param('U', nn.initializers.orthogonal(),
                       (self.latent_dim,
                        self.channels * self.resolution * self.resolution))
        L = self.param('L', lambda key, shape: jnp.asarray(
            [[3.0 * i for i in range(self.latent_dim, 0, -1)]]), None)
        mu = self.param('mu', nn.initializers.zeros_init(),
                        (self.resolution, self.resolution, self.channels))
        x = (L * z) @ U      # [B, C*R*R]
        x = x.reshape(-1, self.channels, self.resolution, self.resolution)
        x = jnp.transpose(x, (0, 2, 3, 1))   # NHWC
        return x + mu[None]


class SNConvT(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.ConvTranspose(self.features,
                                (self.kernel_size, self.kernel_size),
                                strides=(self.strides, self.strides),
                                padding='SAME', use_bias=self.use_bias,
                                dtype=self.dtype)
        if self.sn:
            return nn.SpectralNorm(conv)(x, update_stats=train)
        return conv(x)


class SNConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       strides=(self.strides, self.strides),
                       padding=self.kernel_size // 2, use_bias=self.use_bias,
                       dtype=self.dtype)
        if self.sn:
            return nn.SpectralNorm(conv)(x, update_stats=train)
        return conv(x)


class Layer(nn.Module):
    '''Subspace injection + two up-convs (reference Layer :68).'''
    in_channels: int
    out_channels: int
    latent_dim: int
    resolution: int
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        act = get_activation(self.act_name)
        w = Subspace(self.latent_dim, self.in_channels, self.resolution)(z)
        w = w.astype(x.dtype)
        w1 = SNConvT(self.in_channels, 1, 1, self.sn, self.use_bias,
                     self.dtype)(w, train)
        h = x + w1
        h = get_normalization(self.norm_name, self.in_channels,
                              dtype=self.dtype)(h)
        h = act(h)
        h = SNConvT(self.out_channels, 3, 2, self.sn, self.use_bias,
                    self.dtype)(h, train)
        w2 = SNConvT(self.out_channels, 3, 2, self.sn, self.use_bias,
                     self.dtype)(w, train)
        h = h + w2
        h = get_normalization(self.norm_name, self.out_channels,
                              dtype=self.dtype)(h)
        h = act(h)
        h = SNConvT(self.out_channels, 3, 1, self.sn, self.use_bias,
                    self.dtype)(h, train)
        return h


class Generator(nn.Module):
    image_size: int = 128
    in_dim: int = 512
    z_dim: int = 6
    image_channels: int = 3
    bottom_width: int = 4
    channels: int = 32
    max_channels: int = 512
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @property
    def num_layers(self):
        return int(np.log2(self.image_size) - np.log2(self.bottom_width))

    @nn.compact
    def __call__(self, eps, zs, train: bool = True):
        num_ups = self.num_layers
        c = self.channels * 2 ** num_ups
        och = min(c, self.max_channels)
        x = eps.reshape(eps.shape[0], 1, 1, -1).astype(self.dtype)
        x = nn.ConvTranspose(och, (self.bottom_width, self.bottom_width),
                             strides=(self.bottom_width, self.bottom_width),
                             padding='VALID', use_bias=self.use_bias,
                             dtype=self.dtype)(x)
        resl = self.bottom_width
        for i in range(num_ups):
            c //= 2
            ich, och = och, min(self.max_channels, c)
            x = Layer(ich, och, self.z_dim, resl, self.sn, self.use_bias,
                      self.norm_name, self.act_name, self.dtype)(
                x, zs[i], train)
            resl *= 2
        x = get_activation(self.act_name)(x)
        x = nn.Conv(self.image_channels, (7, 7), padding=3,
                    use_bias=self.use_bias, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    image_size: int = 128
    image_channels: int = 3
    bottom_width: int = 4
    channels: int = 16
    max_channels: int = 512
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_downs = int(np.log2(self.image_size) - np.log2(self.bottom_width))
        act = get_activation(self.act_name)
        c = self.channels
        och = min(c, self.max_channels)
        x = SNConv(och, 7, 1, self.sn, self.use_bias, self.dtype)(
            x.astype(self.dtype), train)
        x = act(x)
        for _ in range(num_downs):
            c *= 2
            ich, och = och, min(self.max_channels, c)
            x = SNConv(ich, 3, 1, self.sn, self.use_bias, self.dtype)(x, train)
            x = get_normalization(self.norm_name, ich, dtype=self.dtype)(x)
            x = act(x)
            x = SNConv(och, 3, 2, self.sn, self.use_bias, self.dtype)(x, train)
            x = get_normalization(self.norm_name, och, dtype=self.dtype)(x)
            x = act(x)
        x = x.reshape(x.shape[0], -1)
        dense1 = nn.Dense(och, use_bias=self.use_bias, dtype=self.dtype)
        x = (nn.SpectralNorm(dense1)(x, update_stats=train)
             if self.sn else dense1(x))
        x = act(x)
        dense2 = nn.Dense(1, use_bias=self.use_bias, dtype=self.dtype)
        x = (nn.SpectralNorm(dense2)(x, update_stats=train)
             if self.sn else dense2(x))
        return x.astype(jnp.float32)


def orthogonal_regularizer(params):
    '''sum over Subspace bases: 0.5 * |U U^T - I|_1 (reference utils.py:18).'''
    loss = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        last = str(path[-1].key) if hasattr(path[-1], 'key') else str(path[-1])
        if last == 'U':
            f = leaf.reshape(leaf.shape[0], -1).astype(jnp.float32)
            sym = f @ f.T
            eye = jnp.eye(sym.shape[-1])
            loss = loss + jnp.sum(jnp.abs(sym - eye)) * 0.5
    return loss
