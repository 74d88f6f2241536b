'''NAFNet line-art colorization (reference `implementations/NAFNet/model.py`):
nonlinear-activation-free UNet — SimpleGate channel-split gating (:19),
simplified channel attention (:44), pixel-shuffle/unshuffle resampling, with
a patch discriminator. Flax NHWC.

Reference quirks kept for behavior parity:
* NAFBlock.forward applies the SAME ConvBlock (shared weights) after both
  norms (`self.conv` twice, reference model.py:93-95); the constructed MLP
  is unused. We reproduce that literally.
* 'ln' is GroupNorm(1, C) — layer norm over (C, H, W) jointly, not the
  transformer per-token LayerNorm (reference model.py:7).
* No output activation (the output conv is the last op, model.py:169).
'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation, get_normalization
from animeface_tpu.implementations.SRGAN.model import pixel_shuffle


def pixel_unshuffle(x, factor: int = 2):
    N, H, W, C = x.shape
    r = factor
    x = x.reshape(N, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(N, H // r, W // r, C * r * r)


def simple_gate(x, act_name=None):
    '''x * act(gate) over a channel split (reference SimpleGate :19);
    act None -> identity, 'sigmoid' -> GLU.'''
    a, b = jnp.split(x, 2, axis=-1)
    if act_name is not None:
        b = get_activation(act_name)(b)
    return a * b


def _norm(name, c, dtype):
    ''''ln' -> GroupNorm(1) over (C,H,W) (reference model.py:6-10).'''
    if name == 'ln':
        return nn.GroupNorm(num_groups=1, dtype=dtype)
    return get_normalization(name, c, dtype=dtype)


class ConvBlock(nn.Module):
    '''1x1 expand -> depthwise 3x3 -> SimpleGate -> SCA -> 1x1
    (reference ConvBlock :56).'''
    channels: int
    act_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = self.channels
        h = nn.Conv(C * 2, (1, 1), dtype=self.dtype)(x)
        h = nn.Conv(C * 2, (3, 3), padding=1, feature_group_count=C * 2,
                    dtype=self.dtype)(h)
        h = simple_gate(h, self.act_name)
        gc = jnp.mean(h, axis=(1, 2), keepdims=True)
        gc = nn.Conv(C, (1, 1), dtype=self.dtype)(gc)
        h = h * gc
        return nn.Conv(C, (1, 1), dtype=self.dtype)(h)


class NAFBlock(nn.Module):
    channels: int
    mlp_ratio: int = 1
    norm_name: str = 'ln'
    act_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = self.channels
        s1 = self.param('layer_scale1', nn.initializers.constant(1e-3), ())
        s2 = self.param('layer_scale2', nn.initializers.constant(1e-3), ())
        conv = ConvBlock(C, self.act_name, self.dtype)   # shared, see quirks
        x = x + s1.astype(x.dtype) * conv(
            _norm(self.norm_name, C, self.dtype)(x))
        x = x + s2.astype(x.dtype) * conv(
            _norm(self.norm_name, C, self.dtype)(x))
        return x


class NAFNet(nn.Module):
    image_size: int = 128
    bottom: int = 16
    channels: int = 64
    max_channels: int = 512
    blocks_per_scale: int = 2
    mid_blocks: int = 6
    mlp_ratio: int = 1
    norm_name: str = 'ln'
    act_name: str | None = None
    in_channels: int = 1
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        num = int(math.log2(self.image_size) - math.log2(self.bottom))
        mk_block = lambda c: NAFBlock(c, self.mlp_ratio, self.norm_name,
                                      self.act_name, self.dtype)
        channels = self.channels
        och = channels
        x = nn.Conv(och, (3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype))
        feats = []
        for _ in range(num):
            channels *= 2
            ich, och = och, min(self.max_channels, channels)
            for _ in range(self.blocks_per_scale):
                x = mk_block(ich)(x)
            feats.append(x)
            x = nn.Conv(och // 4, (3, 3), padding=1, dtype=self.dtype)(x)
            x = pixel_unshuffle(x, 2)
        for _ in range(self.mid_blocks):
            x = mk_block(och)(x)
        for _ in range(num):
            channels //= 2
            ich, och = och, min(self.max_channels, channels)
            x = nn.Conv(och * 4, (3, 3), padding=1, dtype=self.dtype)(x)
            x = pixel_shuffle(x, 2)
            x = x + feats.pop()
            for _ in range(self.blocks_per_scale):
                x = mk_block(och)(x)
        # no output activation (reference model.py:169)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class Discriminator(nn.Module):
    '''Patch D (reference Discriminator :174): k4 s2 convs + norm + act.'''
    num_layers: int = 3
    channels: int = 64
    max_channels: int = 512
    norm_name: str = 'bn'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.act_name)
        c = self.channels
        x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x.astype(self.dtype))
        x = act(x)
        for _ in range(self.num_layers - 1):
            c = min(self.max_channels, c * 2)
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(x)
            if self.norm_name == 'bn':
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype)(x)
            else:
                x = _norm(self.norm_name, c, self.dtype)(x)
            x = act(x)
        x = nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        return x.astype(jnp.float32)
