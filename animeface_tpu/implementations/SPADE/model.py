'''SPADE (reference `implementations/SPADE/model.py`: SPADE :42 — spatially-
adaptive denormalization from the semantic map — SPADEResBlock :68,
Generator :117, VAE-style Encoder :223, multi-scale D :190 shared with
SRGAN). Full reference knob surface: norm/act names, spectral norm, bias
toggles per network; the SPADE block's own convs are never spectral-
normalized (reference :48 hardcodes use_sn=False). Flax NHWC; when SN or a
running-stats norm is enabled the module carries a 'batch_stats' collection
(power-iteration u / running moments) updated under train=True.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import Discriminator  # noqa: F401
from animeface_tpu.nnutils.module.layers import get_activation


def _norm_noaffine(name: str, dtype, train: bool = True):
    '''Norm without learnable affine (reference get_normalization(...,
    affine=False) inside SPADE :50).'''
    if name == 'bn':
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            use_bias=False, use_scale=False, dtype=dtype)
    if name == 'in':
        return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, dtype=dtype)
    raise ValueError(f'norm {name!r}')


class SNConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    use_sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=self.strides, padding=self.kernel_size // 2,
                    use_bias=self.use_bias,
                    kernel_init=nn.initializers.xavier_normal(),
                    dtype=self.dtype)
        if self.use_sn:
            return nn.SpectralNorm(c)(x, update_stats=train)
        return c(x)


class SPADE(nn.Module):
    '''norm(x) * gamma(seg) + beta(seg) (reference :42). No SN (ref :48).'''
    hidden_channels: int = 128
    norm_name: str = 'bn'
    act_name: str = 'relu'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, seg, train: bool = True):
        C = x.shape[-1]
        norm = _norm_noaffine(self.norm_name, self.dtype, train)(x)
        seg = jax.image.resize(seg, x.shape[:3] + (seg.shape[-1],),
                               method='nearest').astype(x.dtype)
        h = SNConv(self.hidden_channels, 3, 1, False, self.use_bias,
                   self.dtype)(seg, train)
        h = get_activation(self.act_name)(h)
        gamma = SNConv(C, 3, 1, False, self.use_bias, self.dtype)(h, train)
        beta = SNConv(C, 3, 1, False, self.use_bias, self.dtype)(h, train)
        return gamma * norm + beta


class SPADEResBlock(nn.Module):
    features: int
    num_conv: int = 2
    hidden_channels: int = 128
    norm_name: str = 'bn'
    act_name: str = 'lrelu'
    use_sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, seg, train: bool = True):
        in_ch = x.shape[-1]
        act = get_activation(self.act_name)
        h = x
        for _ in range(self.num_conv):
            h = SPADE(self.hidden_channels, self.norm_name, self.act_name,
                      self.use_bias, self.dtype)(h, seg, train)
            h = act(h)
            h = SNConv(self.features, 3, 1, self.use_sn, self.use_bias,
                       self.dtype)(h, train)
        if in_ch != self.features:
            t = SPADE(self.hidden_channels, self.norm_name, self.act_name,
                      self.use_bias, self.dtype)(x, seg, train)
            t = act(t)
            x = SNConv(self.features, 3, 1, self.use_sn, self.use_bias,
                       self.dtype)(t, train)
        return x + h


class Generator(nn.Module):
    image_size: int = 128
    z_dim: int = 256
    in_channels: int = 1      # semantic-map channels
    out_channels: int = 3
    channels: int = 32
    max_channels: int = 1024
    block_num_conv: int = 2
    spade_hidden_channels: int = 128
    norm_name: str = 'bn'
    act_name: str = 'lrelu'
    use_sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, seg, train: bool = True):
        num_ups = int(np.log2(self.image_size) - 2)
        c = self.channels * 2 ** num_ups
        och = min(self.max_channels, c)
        x = nn.Dense(och * 16, use_bias=self.use_bias,
                     kernel_init=nn.initializers.xavier_normal(),
                     dtype=self.dtype)(z.astype(self.dtype))
        x = x.reshape(-1, 4, 4, och)
        for _ in range(num_ups):
            c //= 2
            och = min(self.max_channels, c)
            x = SPADEResBlock(och, self.block_num_conv,
                              self.spade_hidden_channels, self.norm_name,
                              self.act_name, self.use_sn, self.use_bias,
                              self.dtype)(x, seg, train)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
        x = SNConv(self.out_channels, 3, 1, self.use_sn, self.use_bias,
                   self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


class Encoder(nn.Module):
    '''VAE-style image encoder for style z (reference :223): stride-2 convs
    down to `target_resl`, then mu/logvar heads + reparameterization.'''
    image_size: int = 128
    z_dim: int = 256
    target_resl: int = 4
    channels: int = 32
    max_channels: int = 512
    norm_name: str = 'bn'
    act_name: str = 'lrelu'
    use_sn: bool = False
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, key, train: bool = True):
        act = get_activation(self.act_name)
        c = self.channels
        size = self.image_size // 2
        x = SNConv(c, 4, 2, self.use_sn, self.use_bias,
                   self.dtype)(x.astype(self.dtype), train)
        x = _norm_noaffine(self.norm_name, self.dtype, train)(x)
        x = act(x)
        while size > self.target_resl:
            size //= 2
            c *= 2
            x = SNConv(min(self.max_channels, c), 4, 2, self.use_sn,
                       self.use_bias, self.dtype)(x, train)
            x = _norm_noaffine(self.norm_name, self.dtype, train)(x)
            x = act(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        mu = nn.Dense(self.z_dim)(x)
        logvar = nn.Dense(self.z_dim)(x)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        return z, mu, logvar
