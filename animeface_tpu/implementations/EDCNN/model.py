'''EDCNN — author-original Sobel-conv edge-enhanced colorization (reference
`implementations/original/EDCNN/model.py`: SobelConv2d :17 fixed directional
bank under a learnable per-connection scale, ResBlock :68, StyleEncoder :93,
Encoder :144 (UNet side), AdaIN :191 with identity-init affine bias,
ConvAdaINBlock :217, Decoder :237 with per-block skip concat + bilinear
upsample, Generator :297, patch Discriminator :333 returning (logit, feats),
init_weight_{N002,xavier,kaiming} :369). Flax NHWC; spectral norm uses the
flax power-iteration wrapper, so modules carry a 'batch_stats' collection
when `sn` (the reference default) is on.'''

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module.layers import (
    get_activation, get_normalization,
)

_SOBEL = np.asarray([
    [[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]],
    [[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]],
    [[-2., -1., 0.], [-1., 0., 1.], [0., 1., 2.]],
    [[0., 1., 2.], [-1., 0., 1.], [-2., -1., 0.]],
], np.float32)


class SNConv(nn.Module):
    '''Conv2d with optional spectral norm (reference Conv2d :57).'''
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=self.strides, padding=self.padding,
                    use_bias=self.use_bias, dtype=self.dtype)
        if self.sn:
            return nn.SpectralNorm(c)(x, update_stats=train)
        return c(x)


class SNDense(nn.Module):
    features: int
    sn: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = nn.Dense(self.features, use_bias=self.use_bias)
        if self.sn:
            return nn.SpectralNorm(d)(x, update_stats=train)
        return d(x)


class SobelConv(nn.Module):
    '''Fixed Sobel bank x learnable per-(in,out) scale; output concatenated
    with the input (reference SobelConv2d :17: weight = scale * kernel,
    kernel is the 4 directional filters tiled over out channels).'''
    out_channels: int = 32
    use_bias: bool = True
    learnable: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.out_channels % 4 == 0
        in_ch = x.shape[-1]
        if self.learnable:
            scale = self.param('scale', nn.initializers.ones_init(),
                               (1, 1, in_ch, self.out_channels))
        else:
            scale = jnp.ones((1, 1, in_ch, self.out_channels), jnp.float32)
        # HWIO kernel: output channel c applies sobel direction c % 4
        kern = np.stack([_SOBEL[i % 4] for i in range(self.out_channels)],
                        axis=-1)                              # [3,3,out]
        kern = np.repeat(kern[:, :, None, :], in_ch, axis=2)  # [3,3,in,out]
        w = jnp.asarray(kern) * scale
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros_init(),
                              (self.out_channels,))
            y = y + bias.astype(y.dtype)
        return jnp.concatenate([x.astype(y.dtype), y], axis=-1)


class ResBlock(nn.Module):
    '''Pre-act residual block, (h + skip) / sqrt(2) (reference :68).'''
    features: int
    strides: int = 1
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        act = get_activation(self.act_name)
        h = get_normalization(self.norm_name, in_ch, dtype=self.dtype)(x)
        h = act(h)
        h = SNConv(self.features, 3, self.strides, 1, self.sn,
                   self.use_bias, self.dtype)(h, train)
        h = get_normalization(self.norm_name, self.features,
                              dtype=self.dtype)(h)
        h = act(h)
        h = SNConv(self.features, 3, 1, 1, self.sn, self.use_bias,
                   self.dtype)(h, train)
        if self.strides > 1 or in_ch != self.features:
            x = SNConv(self.features, 1, self.strides, 0, self.sn,
                       self.use_bias, self.dtype)(x, train)
        return (h + x) / np.sqrt(2)


class StyleEncoder(nn.Module):
    '''conv7x7 -> ResBlock ladder -> GAP -> Linear(style_dim) (:93).'''
    style_dim: int
    image_size: int
    bottom_width: int = 8
    channels: int = 32
    blocks_per_resl: int = 1
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref, train: bool = True):
        num_downs = int(math.log2(self.image_size)
                        - math.log2(self.bottom_width))
        x = SNConv(self.channels, 7, 1, 3, self.sn, self.use_bias,
                   self.dtype)(ref.astype(self.dtype), train)
        ch = self.channels
        for _ in range(num_downs):
            ch *= 2
            for i in range(self.blocks_per_resl):
                x = ResBlock(ch, 2 if i == 0 else 1, self.sn, self.use_bias,
                             self.norm_name, self.act_name, self.dtype)(
                    x, train)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return SNDense(self.style_dim, self.sn, self.use_bias)(x, train)


class ConvBlock(nn.Module):
    '''conv3x3 -> norm -> act (reference ConvBlock :131).'''
    features: int
    strides: int = 1
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = SNConv(self.features, 3, self.strides, 1, self.sn, self.use_bias,
                   self.dtype)(x, train)
        x = get_normalization(self.norm_name, self.features,
                              dtype=self.dtype)(x)
        return get_activation(self.act_name)(x)


class Encoder(nn.Module):
    '''Sketch encoder collecting per-block features for the UNet skips
    (reference Encoder :144; feats = [input conv out, every ConvBlock out]).'''
    image_size: int
    bottom_width: int = 8
    channels: int = 32
    sobel: bool = True
    learnable_sobel: bool = True
    conv_per_resl: int = 2
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_downs = int(math.log2(self.image_size)
                        - math.log2(self.bottom_width))
        x = x.astype(self.dtype)
        if self.sobel:
            x = SobelConv(self.channels, self.use_bias, self.learnable_sobel,
                          self.dtype)(x)
        x = SNConv(self.channels, 7, 1, 3, self.sn, self.use_bias,
                   self.dtype)(x, train)
        x = get_activation(self.act_name)(x)
        feats = [x]
        ch = self.channels
        for _ in range(num_downs):
            ch *= 2
            for i in range(self.conv_per_resl):
                x = ConvBlock(ch, 2 if i == 0 else 1, self.sn, self.use_bias,
                              self.norm_name, self.act_name, self.dtype)(
                    x, train)
                feats.append(x)
        return x, feats


class AdaIN(nn.Module):
    '''Instance norm modulated by style (reference AdaIN :191). The affine
    bias is identity-initialised: scale half ones, bias half zeros.'''
    style_dim: int
    affine: bool = True
    sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, train: bool = True):
        C = x.shape[-1]
        if self.affine:
            style = SNDense(C * 2, self.sn, use_bias=False)(
                style.astype(jnp.float32), train)
            affine_bias = self.param(
                'affine_bias',
                lambda key, shape: jnp.concatenate(
                    [jnp.ones(shape[0] // 2), jnp.zeros(shape[0] // 2)]),
                (C * 2,))
            style = style + affine_bias
        else:
            assert style.shape[-1] == C * 2
        scale, bias = jnp.split(style, 2, axis=-1)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        norm = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return scale[:, None, None, :].astype(x.dtype) * norm \
            + bias[:, None, None, :].astype(x.dtype)


class ConvAdaINBlock(nn.Module):
    '''conv3x3 -> AdaIN -> act (reference :217).'''
    features: int
    style_dim: int
    strides: int = 1
    affine: bool = True
    sn: bool = True
    use_bias: bool = True
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, train: bool = True):
        x = SNConv(self.features, 3, self.strides, 1, self.sn, self.use_bias,
                   self.dtype)(x, train)
        x = AdaIN(self.style_dim, self.affine, self.sn, self.dtype)(
            x, style, train)
        return get_activation(self.act_name)(x)


class Decoder(nn.Module):
    '''AdaIN decoder; every conv consumes cat([x, encoder skip]) and each
    resolution ends with a bilinear 2x upsample (reference Decoder :237;
    align_corners=False == jax.image.resize 'bilinear'). No output tanh —
    the reference returns the conv7x7 output raw.'''
    image_size: int
    out_channels: int
    style_dim: int
    bottom_width: int = 8
    channels: int = 32
    conv_per_resl: int = 2
    sn: bool = True
    use_bias: bool = True
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, feats, style, train: bool = True):
        num_downs = int(math.log2(self.image_size)
                        - math.log2(self.bottom_width))
        feats = feats[::-1]
        index = 0
        ch = self.channels * 2 ** num_downs
        for _ in range(num_downs):
            ch //= 2
            for _ in range(self.conv_per_resl):
                x = jnp.concatenate(
                    [x, feats[index].astype(x.dtype)], axis=-1)
                x = ConvAdaINBlock(ch, self.style_dim, 1, True, self.sn,
                                   self.use_bias, self.act_name, self.dtype)(
                    x, style, train)
                index += 1
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='bilinear')
        return SNConv(self.out_channels, 7, 1, 3, self.sn, self.use_bias,
                      self.dtype)(x, train)


class Generator(nn.Module):
    '''Reference Generator :297 — style encoder over the color reference,
    Sobel UNet encoder over the gray input, ResBlocks bottleneck, AdaIN
    skip-concat decoder.'''
    image_size: int
    in_channels: int = 1
    ref_channels: int = 3
    channels: int = 32
    style_dim: int = 128
    bottom_width: int = 8
    se_blocks_per_resl: int = 1
    num_res_blocks: int = 5
    sobel: bool = True
    learnable_sobel: bool = True
    e_conv_per_resl: int = 2
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ref, train: bool = True):
        style = StyleEncoder(
            self.style_dim, self.image_size, self.bottom_width, self.channels,
            self.se_blocks_per_resl, self.sn, self.use_bias, self.norm_name,
            self.act_name, self.dtype)(ref, train)
        x, feats = Encoder(
            self.image_size, self.bottom_width, self.channels, self.sobel,
            self.learnable_sobel, self.e_conv_per_resl, self.sn,
            self.use_bias, self.norm_name, self.act_name, self.dtype)(
            x, train)
        for _ in range(self.num_res_blocks):
            x = ResBlock(x.shape[-1], 1, self.sn, self.use_bias,
                         self.norm_name, self.act_name, self.dtype)(x, train)
        out = Decoder(
            self.image_size, self.ref_channels, self.style_dim,
            self.bottom_width, self.channels, self.e_conv_per_resl, self.sn,
            self.use_bias, self.act_name, self.dtype)(x, feats, style, train)
        return out.astype(jnp.float32)


class Discriminator(nn.Module):
    '''Patch D returning (final logit map, intermediate features)
    (reference :333; convs are 4x4 valid-padded like torch's default).'''
    num_layers: int = 3
    channels: int = 32
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.act_name)
        ch = self.channels
        x = SNConv(ch, 4, 2, 0, self.sn, self.use_bias, self.dtype)(
            x.astype(self.dtype), train)
        x = act(x)
        feats = [x]
        for _ in range(self.num_layers):
            ch *= 2
            x = SNConv(ch, 4, 2, 0, self.sn, self.use_bias, self.dtype)(
                x, train)
            x = get_normalization(self.norm_name, ch, dtype=self.dtype)(x)
            x = act(x)
            feats.append(x)
        x = SNConv(1, 4, 1, 0, self.sn, self.use_bias, self.dtype)(x, train)
        return x, feats
