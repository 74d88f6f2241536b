'''pix2pixHD (reference `implementations/pix2pixHD/model.py`: Conv2dBlock
:15 reflect-padded, GlobalG :56, LocalG :88, coarse-to-fine Generator :117,
SingleScaleDiscriminator :140 returning (logit, feats), multi-scale
Discriminator :163 with avg-pool pyramid, init_weight_normal :190 N(0,0.02)).
Flax NHWC. norm_name/act_name '' -> identity, like the reference's
get_normalization/get_activation fallthrough (:5-12).'''

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module.layers import (
    get_activation, get_normalization,
)


def _norm(name, ch, dtype):
    if name in ('bn', 'in'):
        return get_normalization(name, ch, dtype=dtype)
    return lambda x: x          # reference: nn.Identity()


def _act(name):
    if name in ('relu', 'lrelu'):
        return get_activation(name)
    return lambda x: x


def _conv(x, features, kernel, stride, norm_name, act_name, dtype,
          padding_mode='reflect', use_norm=True):
    '''Conv2dBlock (reference :15): conv (reflect-padded) -> norm -> act.'''
    pad = kernel // 2
    if pad:
        mode = 'reflect' if padding_mode == 'reflect' else 'constant'
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding='VALID', dtype=dtype)(x)
    if use_norm:
        x = _norm(norm_name, features, dtype)(x)
    return _act(act_name)(x)


def _convT(x, features, norm_name, act_name, dtype):
    '''ConvTranspose2dBlock (reference :29): k3 s2 p1 op1.'''
    x = nn.ConvTranspose(features, (3, 3), strides=(2, 2), padding='SAME',
                         dtype=dtype)(x)
    x = _norm(norm_name, features, dtype)(x)
    return _act(act_name)(x)


class ResBlock(nn.Module):
    '''conv-norm-act -> conv-norm, + x (reference :43).'''
    channels: int
    norm_name: str = 'in'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _conv(x, self.channels, 3, 1, self.norm_name, self.act_name,
                  self.dtype)
        h = _conv(h, self.channels, 3, 1, self.norm_name, '', self.dtype)
        return x + h


class GlobalG(nn.Module):
    out_channels: int = 3
    channels: int = 64
    num_downs: int = 4
    num_blocks: int = 9
    norm_name: str = 'in'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = _conv(x.astype(self.dtype), c, 7, 1, self.norm_name,
                  self.act_name, self.dtype)
        for _ in range(self.num_downs):
            c *= 2
            x = _conv(x, c, 3, 2, self.norm_name, self.act_name, self.dtype,
                      'zeros')
        for _ in range(self.num_blocks):
            x = ResBlock(c, self.norm_name, self.act_name, self.dtype)(x)
        for _ in range(self.num_downs):
            c //= 2
            x = _convT(x, c, self.norm_name, self.act_name, self.dtype)
        feat = x
        out = _conv(x, self.out_channels, 7, 1, '', '', self.dtype,
                    use_norm=False)
        return feat, jnp.tanh(out.astype(jnp.float32))


class LocalG(nn.Module):
    out_channels: int = 3
    channels: int = 32
    num_blocks: int = 3
    norm_name: str = 'in'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, global_feat):
        c = self.channels
        x = _conv(x.astype(self.dtype), c, 7, 1, self.norm_name,
                  self.act_name, self.dtype)
        x = _conv(x, c * 2, 3, 2, self.norm_name, self.act_name, self.dtype,
                  'zeros')
        x = x + global_feat.astype(x.dtype)
        for _ in range(self.num_blocks):
            x = ResBlock(c * 2, self.norm_name, self.act_name, self.dtype)(x)
        x = _convT(x, c, self.norm_name, self.act_name, self.dtype)
        x = _conv(x, self.out_channels, 7, 1, '', '', self.dtype,
                  use_norm=False)
        return jnp.tanh(x.astype(jnp.float32))


class Generator(nn.Module):
    '''Coarse-to-fine: GlobalG on the half-res input, LocalG refines (:117).
    Submodules are named for phase-wise gradient masking ('global_g' /
    'local_g', reference trains them with separate optimizers :292/:314).'''
    out_channels: int = 3
    channels: int = 32
    local_num_blocks: int = 3
    global_num_blocks: int = 3
    global_num_downs: int = 4
    norm_name: str = 'in'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    def setup(self):
        self.global_g = GlobalG(self.out_channels, self.channels * 2,
                                self.global_num_downs,
                                self.global_num_blocks, self.norm_name,
                                self.act_name, self.dtype)
        self.local_g = LocalG(self.out_channels, self.channels,
                              self.local_num_blocks, self.norm_name,
                              self.act_name, self.dtype)

    def __call__(self, x):
        low = nn.avg_pool(x, (2, 2), strides=(2, 2))
        g_feat, g_image = self.global_g(low)
        l_image = self.local_g(x, g_feat)
        return l_image, g_image

    def global_forward(self, x):
        '''Global-phase forward on the (already half-res) input
        (reference G.global_G(line), utils.py:57).'''
        _, g_image = self.global_g(x)
        return g_image


class SingleScaleD(nn.Module):
    '''k4 s2 PatchGAN trunk + conv3 head; returns (logit, feats) (:140).
    The first block has no norm (reference passes '' :146).'''
    channels: int = 32
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        feats = []
        x = _conv(x.astype(self.dtype), c, 4, 2, '', self.act_name,
                  self.dtype, 'zeros', use_norm=False)
        feats.append(x)
        for _ in range(3):
            c *= 2
            x = _conv(x, c, 4, 2, self.norm_name, self.act_name, self.dtype,
                      'zeros')
            feats.append(x)
        x = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)(x)
        return x.astype(jnp.float32), feats


class Discriminator(nn.Module):
    '''Multi-scale D over an avg-pool pyramid; returns a list of
    (logit, feats) per scale, finest first (:163). Scales are named
    'scale_<i>' so the global phase can mask coarse-scale grads
    (reference optimizer over discriminates[:g_d_scale], :296).'''
    channels: int = 32
    num_scales: int = 3
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(self.num_scales):
            outs.append(SingleScaleD(self.channels, self.norm_name,
                                     self.act_name, self.dtype,
                                     name=f'scale_{i}')(x))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return outs
