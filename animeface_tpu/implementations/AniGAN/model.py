'''AniGAN (reference `implementations/AniGAN/model.py`): face->anime I2I with
PoLIN / AdaPoLIN normalization (1x1-conv fusion of instance+layer norm,
:21/:38), AST (style-conditioned conv stack :60) and FST upsampling blocks
(:83), content + style encoders (:105/:135), and a shared-trunk dual-branch
discriminator (:215/:246) returning per-branch features for feature matching.

Reference details reproduced: EVERY conv/linear is spectral-normalized
(:16-19) except AdaPoLIN's style affine (:46, plain Linear); the layer norm
inside PoLIN carries a per-(H,W,C) elementwise affine (torch
`nn.LayerNorm((C,R,R))`, :28); `affine=False` (default) feeds the style
vector directly as (gamma||beta) of width 2*bottom_channels and keeps the
decoder width constant, `affine=True` maps a `style_dim` code per AdaPoLIN
and halves the decoder width per FST (:165-171); AdaPoLIN's affine bias
initializes gamma to 1 (:47-48).'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module.layers import get_activation


def _instance_norm(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def _norm(name, x, train):
    if name == 'in':
        return _instance_norm(x)
    if name == 'bn':
        return nn.BatchNorm(use_running_average=not train,
                            momentum=0.9, dtype=x.dtype)(x)
    raise Exception(f'no normalization as {name}')


class SNConv(nn.Module):
    '''Spectral-normalized conv (reference Conv2d wrapper, model.py:16).'''
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.Conv(self.features,
                       (self.kernel_size, self.kernel_size),
                       strides=(self.strides, self.strides),
                       padding=self.padding, use_bias=self.use_bias,
                       dtype=self.dtype)
        return nn.SpectralNorm(conv)(x, update_stats=train)


class SNDense(nn.Module):
    '''Spectral-normalized linear (reference Linear wrapper, model.py:18).'''
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dense = nn.Dense(self.features, use_bias=self.use_bias,
                         dtype=self.dtype)
        return nn.SpectralNorm(dense)(x, update_stats=train)


class PoLIN(nn.Module):
    '''1x1-conv fusion of instance and layer norm (reference PoLIN_lazy,
    model.py:21): the LN has a learnable per-(H,W,C) elementwise affine.'''
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ln = nn.LayerNorm(reduction_axes=(1, 2, 3), feature_axes=(1, 2, 3),
                          dtype=self.dtype)(x)
        fused = jnp.concatenate([_instance_norm(x), ln], axis=-1)
        return SNConv(x.shape[-1], 1, 1, 0, use_bias=False,
                      dtype=self.dtype)(fused, train)


class AdaPoLIN(nn.Module):
    '''PoLIN modulated by a style (gamma||beta) vector (reference :38).
    `affine`: map a style_dim code through a plain Linear with a bias that
    initializes gamma to one; otherwise the style IS (gamma||beta).'''
    affine: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, train: bool = True):
        C = x.shape[-1]
        if self.affine:
            style = nn.Dense(C * 2, use_bias=False)(
                style.astype(jnp.float32))
            bias = self.param(
                'affine_bias',
                lambda k, s: jnp.concatenate([jnp.ones((C,)),
                                              jnp.zeros((C,))]), None)
            style = style + bias
        gamma, beta = jnp.split(style.astype(jnp.float32), 2, axis=-1)
        norm = PoLIN(self.dtype)(x, train)
        return gamma[:, None, None, :].astype(norm.dtype) * norm \
            + beta[:, None, None, :].astype(norm.dtype)


class AST(nn.Module):
    '''num_convs x (SNConv + AdaPoLIN + act) (reference :60).'''
    channels: int
    num_convs: int = 5
    affine: bool = False
    use_bias: bool = True
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, train: bool = True):
        act = get_activation(self.act_name)
        for _ in range(self.num_convs):
            x = SNConv(self.channels, 3, 1, 1, self.use_bias,
                       self.dtype)(x, train)
            x = AdaPoLIN(self.affine, self.dtype)(x, style, train)
            x = act(x)
        return x


class FST(nn.Module):
    '''up2 -> SNConv -> PoLIN -> act -> SNConv -> AdaPoLIN -> act (:83).'''
    features: int
    affine: bool = False
    use_bias: bool = True
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, train: bool = True):
        act = get_activation(self.act_name)
        N, H, W, C = x.shape
        x = jax.image.resize(x, (N, H * 2, W * 2, C), method='bilinear')
        x = SNConv(self.features, 3, 1, 1, self.use_bias,
                   self.dtype)(x, train)
        x = act(PoLIN(self.dtype)(x, train))
        x = SNConv(self.features, 3, 1, 1, self.use_bias,
                   self.dtype)(x, train)
        x = AdaPoLIN(self.affine, self.dtype)(x, style, train)
        return act(x)


class ContentEncoder(nn.Module):
    '''Reference ConetentEncoder (sic, model.py:105).'''
    image_size: int
    bottom_width: int = 8
    channels: int = 32
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.act_name)
        num_downs = int(math.log2(self.image_size)
                        - math.log2(self.bottom_width))
        c = self.channels
        x = act(SNConv(c, 7, 1, 3, self.use_bias,
                       self.dtype)(x.astype(self.dtype), train))
        for _ in range(num_downs):
            c *= 2
            x = SNConv(c, 3, 2, 1, self.use_bias, self.dtype)(x, train)
            x = act(_norm(self.norm_name, x, train))
        return SNConv(c, 3, 1, 1, self.use_bias, self.dtype)(x, train)


class StyleEncoder(nn.Module):
    '''Reference StyleEncoder (:135): content trunk + flatten-MLP head.'''
    image_size: int
    bottom_width: int = 8
    channels: int = 32
    affine: bool = False
    style_dim: int = 256
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.act_name)
        num_downs = int(math.log2(self.image_size)
                        - math.log2(self.bottom_width))
        c = self.channels
        x = act(SNConv(c, 7, 1, 3, self.use_bias,
                       self.dtype)(x.astype(self.dtype), train))
        for _ in range(num_downs):
            c *= 2
            x = SNConv(c, 3, 2, 1, self.use_bias, self.dtype)(x, train)
            x = act(_norm(self.norm_name, x, train))
        x = x.reshape(x.shape[0], -1)
        x = act(SNDense(c * 2, self.use_bias, self.dtype)(x, train))
        out_dim = self.style_dim if self.affine else c * 2
        return SNDense(out_dim, self.use_bias, self.dtype)(x, train)


class Decoder(nn.Module):
    '''Reference Decoder (:158): AST + FSTs + 7x7 tanh output.'''
    image_size: int
    bottom_width: int = 8
    bottom_channels: int = 512
    out_channels: int = 3
    affine: bool = False
    use_bias: bool = True
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, train: bool = True):
        num_ups = int(math.log2(self.image_size)
                      - math.log2(self.bottom_width))
        channels = self.bottom_channels
        x = AST(channels, 5, self.affine, self.use_bias, self.act_name,
                self.dtype)(x, style, train)
        for _ in range(num_ups):
            if self.affine:
                channels //= 2
            x = FST(channels, self.affine, self.use_bias, self.act_name,
                    self.dtype)(x, style, train)
        x = SNConv(self.out_channels, 7, 1, 3, self.use_bias,
                   self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


class Generator(nn.Module):
    '''G(x, ref) (reference :193): content from x, style from ref.'''
    image_size: int = 128
    in_channels: int = 3
    out_channels: int = 3
    bottom_width: int = 8
    channels: int = 32
    affine: bool = False
    style_dim: int = 256
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ref, train: bool = True):
        num_downs = int(math.log2(self.image_size)
                        - math.log2(self.bottom_width))
        bottom_channels = self.channels * 2 ** num_downs
        content = ContentEncoder(
            self.image_size, self.bottom_width, self.channels,
            self.use_bias, self.norm_name, self.act_name, self.dtype)(
                x, train)
        style = StyleEncoder(
            self.image_size, self.bottom_width, self.channels, self.affine,
            self.style_dim, self.use_bias, self.norm_name, self.act_name,
            self.dtype)(ref, train)
        return Decoder(
            self.image_size, self.bottom_width, bottom_channels,
            self.out_channels, self.affine, self.use_bias, self.act_name,
            self.dtype)(content, style, train)


class DiscHead(nn.Module):
    '''Per-domain branch (reference :215): log2(branch_width)-1 downs +
    stride-2 output conv; returns (patch logits, feature list).'''
    branch_width: int
    channels: int
    max_channels: int = 512
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.act_name)
        feats = []
        c = self.channels
        for _ in range(int(math.log2(self.branch_width) - 1)):
            c *= 2
            x = SNConv(min(self.max_channels, c), 3, 2, 1, self.use_bias,
                       self.dtype)(x, train)
            x = act(_norm(self.norm_name, x, train))
            feats.append(x)
        logit = SNConv(1, 3, 2, 1, self.use_bias, self.dtype)(x, train)
        return logit.astype(jnp.float32), feats


class Discriminator(nn.Module):
    '''Shared trunk + A/B branch heads (reference :246).'''
    image_size: int = 128
    branch_width: int = 32
    in_channels: int = 3
    channels: int = 32
    max_channels: int = 512
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_features: bool = True,
                 train: bool = True):
        act = get_activation(self.act_name)
        shallow_downs = int(math.log2(self.image_size)
                            - math.log2(self.branch_width))
        c = self.channels
        x = act(SNConv(c, 7, 1, 3, self.use_bias,
                       self.dtype)(x.astype(self.dtype), train))
        shallow_feats = []
        for _ in range(shallow_downs):
            c *= 2
            x = SNConv(min(self.max_channels, c), 3, 2, 1, self.use_bias,
                       self.dtype)(x, train)
            x = act(_norm(self.norm_name, x, train))
            shallow_feats.append(x)

        a_prob, a_feats = DiscHead(
            self.branch_width, c, self.max_channels, self.use_bias,
            self.norm_name, self.act_name, self.dtype, name='A_head')(
                x, train)
        b_prob, b_feats = DiscHead(
            self.branch_width, c, self.max_channels, self.use_bias,
            self.norm_name, self.act_name, self.dtype, name='B_head')(
                x, train)

        if return_features:
            return a_prob, b_prob, shallow_feats, a_feats, b_feats
        return a_prob, b_prob
