'''Restormer line-art colorization (reference `implementations/Restormer/
model.py`): MDTA transposed channel attention (:46 — attention over the
channel axis with L2-normalized HW-token features) and GDFN gated depthwise
feed-forward (:27) in a UNet; reuses NAFNet's patch D. Flax NHWC.'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.NAFNet.model import (
    Discriminator, pixel_unshuffle,  # noqa: F401
)
from animeface_tpu.implementations.SRGAN.model import pixel_shuffle


class GDFN(nn.Module):
    channels: int
    expansion: float = 2.66
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.channels * self.expansion)
        h = nn.Conv(mid * 2, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.Conv(mid * 2, (3, 3), padding=1, use_bias=False,
                    feature_group_count=mid * 2, dtype=self.dtype)(h)
        h1, h2 = jnp.split(h, 2, axis=-1)
        h = jax.nn.gelu(h1) * h2
        return nn.Conv(self.channels, (1, 1), use_bias=False,
                       dtype=self.dtype)(h)


class MDTA(nn.Module):
    '''Channel attention: tokens are channels, features are HW (:46).'''
    channels: int
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hd = C // self.num_heads
        temp = self.param('temperature',
                          nn.initializers.constant(hd ** -0.5), ())
        qkv = nn.Conv(C * 3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        qkv = nn.Conv(C * 3, (3, 3), padding=1, use_bias=False,
                      feature_group_count=C * 3, dtype=self.dtype)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, H * W, self.num_heads, hd).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)            # [B,h,hd,HW]
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-8)
        attn = jnp.einsum('bhcn,bhdn->bhcd', q, k,
                          preferred_element_type=jnp.float32) \
            * temp.astype(jnp.float32)
        attn = jax.nn.softmax(attn, -1).astype(v.dtype)
        out = jnp.einsum('bhcd,bhdn->bhcn', attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(B, H, W, C)
        return nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype)(out)


class Block(nn.Module):
    channels: int
    num_heads: int = 4
    ff_expansion: float = 2.66
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.param('attn_scale', nn.initializers.constant(1e-2), ())
        s2 = self.param('ff_scale', nn.initializers.constant(1e-2), ())
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + s1.astype(x.dtype) * MDTA(self.channels, self.num_heads,
                                          self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        return x + s2.astype(x.dtype) * GDFN(self.channels, self.ff_expansion,
                                             dtype=self.dtype)(h)


class Generator(nn.Module):
    '''Restormer UNet (reference Generator :125-210): len(num_blocks) scales
    with per-scale transformer depth/heads, pixel-unshuffle downs, decoder
    with CONCAT skip + 1x1 reduce (no reduce at the outermost level, which
    runs at 2*base width, ref :166-171), a refinement stage at that width,
    and optional input->output skip (`skip_input`). Final tanh is a TPU-side
    delta (bf16 range guard; the reference emits raw logits into LSGAN).'''
    num_blocks: tuple = (2, 6, 6, 8)
    num_heads: tuple = (1, 2, 4, 8)
    num_refinement_blocks: int = 4
    ff_expansion: float = 2.66
    channels: int = 48
    skip_input: bool = False
    in_channels: int = 1
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert len(self.num_blocks) == len(self.num_heads)
        skip = x.astype(jnp.float32)
        base = c = self.channels
        x = nn.Conv(c, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(
            x.astype(self.dtype))
        feats = []
        for nb, nh in zip(self.num_blocks[:-1], self.num_heads[:-1]):
            for _ in range(nb):
                x = Block(c, nh, self.ff_expansion, self.dtype)(x)
            feats.append(x)
            # downsample: conv C->C//2 then unshuffle (C//2*4 == 2C)
            x = nn.Conv(c // 2, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            x = pixel_unshuffle(x, 2)
            c *= 2
        for _ in range(self.num_blocks[-1]):
            x = Block(c, self.num_heads[-1], self.ff_expansion, self.dtype)(x)
        for nb, nh in zip(reversed(self.num_blocks[:-1]),
                          reversed(self.num_heads[:-1])):
            x = nn.Conv(c * 2, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            x = pixel_shuffle(x, 2)
            c //= 2
            x = jnp.concatenate([x, feats.pop()], axis=-1)
            if c != base:            # ref :166: no reduce at the last level
                x = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(x)
                width = c
            else:
                width = 2 * c
            for _ in range(nb):
                x = Block(width, nh, self.ff_expansion, self.dtype)(x)
        for _ in range(self.num_refinement_blocks):
            x = Block(width, self.num_heads[0], self.ff_expansion,
                      self.dtype)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        if self.skip_input:
            if skip.shape[-1] != x.shape[-1]:   # 1-ch line -> RGB broadcast
                skip = jnp.repeat(skip, x.shape[-1] // skip.shape[-1], -1)
            x = x + skip
        return jnp.tanh(x)
