'''GANILLA (reference `implementations/GANILLA/model.py`): illustration-style
I2I — encoder blocks concatenate their input with the conv branch before a
fusion conv (Block :29), decoder sums upsampled features with projected
encoder skips (Decoder :124), patch D returning per-layer features.

Knobs match the reference signatures (Generator :192, Discriminator :215):
num_downs override, bottom_width, sn, bias, norm_name, act_name,
layer_num_blocks, hid_channels. TPU deltas: NHWC; reflection pads are
jnp.pad(mode='reflect'); `nn.Upsample(scale_factor=2)` (nearest) is
jax.image.resize; spectral norm is flax nn.SpectralNorm (batch_stats).
'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation, get_normalization


def _rpad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode='reflect')


class RConv(nn.Module):
    '''ReflectionPad + conv (+ optional SN) — the reference's Conv2d helper
    composed with its explicit pad layers.'''
    features: int
    kernel: int = 3
    strides: int = 1
    pad: int | None = None
    sn: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.pad if self.pad is not None else self.kernel // 2
        if p:
            x = _rpad(x, p)
        conv = nn.Conv(self.features, (self.kernel,) * 2,
                       strides=(self.strides,) * 2, padding='VALID',
                       use_bias=self.use_bias, dtype=self.dtype)
        return nn.SpectralNorm(conv)(x, update_stats=train) if self.sn \
            else conv(x)


class Block(nn.Module):
    '''Residual-concat block (reference Block :29).'''
    features: int
    strides: int = 1
    sn: bool = True
    use_bias: bool = False
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda c: get_normalization(self.norm_name, c,
                                           dtype=self.dtype)
        act = get_activation(self.act_name)
        h = RConv(self.features, 3, self.strides, None, self.sn,
                  self.use_bias, self.dtype)(x, train)
        h = act(norm(self.features)(h))
        h = RConv(self.features, 3, 1, None, self.sn, self.use_bias,
                  self.dtype)(h, train)
        h = norm(self.features)(h)
        if x.shape[-1] != self.features or self.strides != 1:
            conv = nn.Conv(self.features, (1, 1),
                           strides=(self.strides,) * 2,
                           use_bias=self.use_bias, dtype=self.dtype)
            x = nn.SpectralNorm(conv)(x, update_stats=train) if self.sn \
                else conv(x)
            x = norm(self.features)(x)
        out = RConv(self.features, 3, 1, None, self.sn, self.use_bias,
                    self.dtype)(jnp.concatenate([h, x], axis=-1), train)
        return act(norm(self.features)(out))


class Generator(nn.Module):
    '''Reference Generator (model.py:192) = Encoder(:95) + Decoder(:139).'''
    image_size: int = 128
    image_channels: int = 3
    bottom_width: int = 8
    num_downs: int | None = None
    num_feats: int = 3
    channels: int = 32
    hid_channels: int = 128
    layer_num_blocks: int = 2
    sn: bool = True
    use_bias: bool = False
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_downs = self.num_downs if self.num_downs is not None else \
            int(np.log2(self.image_size) - np.log2(self.bottom_width))
        assert self.num_feats < num_downs
        norm = lambda c: get_normalization(self.norm_name, c,
                                           dtype=self.dtype)
        act = get_activation(self.act_name)

        # encoder input: rpad3 conv7 norm act rpad1 maxpool3/2 (:106-113)
        c = self.channels
        x = RConv(c, 7, 1, 3, self.sn, self.use_bias,
                  self.dtype)(x.astype(self.dtype), train)
        x = act(norm(c)(x))
        x = _rpad(x, 1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        feats = [x]
        for i in range(num_downs):
            c *= 2
            stride = 1 if i == 0 else 2
            for j in range(self.layer_num_blocks):
                x = Block(c, stride if j == 0 else 1, self.sn, self.use_bias,
                          self.norm_name, self.act_name, self.dtype)(x, train)
            feats.append(x)
        skips = feats[-(self.num_feats + 1):-1]

        # decoder (:139-190): conv -> up -> (skip conv + add -> up) x feats
        # -> extra (conv -> up) stages when num_ups-1 != num_feats
        def up2(h):
            N, H, W, C = h.shape
            return jax.image.resize(h, (N, H * 2, W * 2, C), method='nearest')

        h = RConv(self.hid_channels, 3, 1, None, self.sn, self.use_bias,
                  self.dtype)(x, train)
        h = up2(h)
        for feat in reversed(skips):
            f = RConv(self.hid_channels, 3, 1, None, self.sn, self.use_bias,
                      self.dtype)(feat, train)
            h = h + f
            h = up2(h)
        for _ in range(num_downs - self.num_feats - 1):
            h = RConv(self.hid_channels, 3, 1, None, self.sn, self.use_bias,
                      self.dtype)(h, train)
            h = up2(h)
        out = RConv(self.image_channels, 7, 1, 3, self.sn, self.use_bias,
                    self.dtype)(h, train)
        return jnp.tanh(out.astype(jnp.float32))


class Discriminator(nn.Module):
    '''Patch D (reference model.py:215): k4 s2 VALID convs, final k4 conv.'''
    in_channels: int = 3
    num_layers: int = 3
    channels: int = 32
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def conv(x, features, strides):
            c = nn.Conv(features, (4, 4), strides=(strides,) * 2,
                        padding='VALID', use_bias=self.use_bias,
                        dtype=self.dtype)
            return nn.SpectralNorm(c)(x, update_stats=train) if self.sn \
                else c(x)

        act = get_activation(self.act_name)
        c = self.channels
        x = act(conv(x.astype(self.dtype), c, 2))
        feats = [x]
        for _ in range(self.num_layers):
            c *= 2
            x = conv(x, c, 2)
            x = get_normalization(self.norm_name, c, dtype=self.dtype)(x)
            x = act(x)
            feats.append(x)
        logits = conv(x, 1, 1)
        assert logits.shape[1] > 0 and logits.shape[2] > 0, (
            f'{logits.shape}: patch grid collapsed — the reference D '
            'is sized for 128px; raise image_size or lower num_layers')
        return logits.astype(jnp.float32), feats
