'''AniGAN (reference `implementations/AniGAN/model.py`): face->anime I2I with
PoLIN / AdaPoLIN normalization (point-wise conv fusion of instance+layer norm,
:22/:39), AST (style-conditioned conv stack :60) and FST upsampling blocks
(:83), content + style encoders, and a shared-trunk dual-branch discriminator
returning per-branch features for feature matching.'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _instance_norm(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def _layer_norm(x):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class PoLIN(nn.Module):
    '''1x1-conv fusion of instance and layer norm (reference :22).'''
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fused = jnp.concatenate([_instance_norm(x), _layer_norm(x)], axis=-1)
        return nn.Conv(x.shape[-1], (1, 1), use_bias=False,
                       dtype=self.dtype)(fused)


class AdaPoLIN(nn.Module):
    '''PoLIN + style-affine gamma/beta (reference :39).'''
    style_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        C = x.shape[-1]
        affine = nn.Dense(C * 2, use_bias=False)(
            style.astype(jnp.float32))
        bias = self.param('affine_bias',
                          lambda k, s: jnp.concatenate(
                              [jnp.ones((C,)), jnp.zeros((C,))]), None)
        gb = affine + bias
        gamma, beta = jnp.split(gb, 2, axis=-1)
        norm = PoLIN(self.dtype)(x)
        return gamma[:, None, None, :].astype(x.dtype) * norm \
            + beta[:, None, None, :].astype(x.dtype)


class AST(nn.Module):
    '''conv + AdaPoLIN + lrelu stack (reference :60).'''
    channels: int
    style_dim: int
    num_convs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        for _ in range(self.num_convs):
            x = nn.Conv(self.channels, (3, 3), padding=1,
                        dtype=self.dtype)(x)
            x = AdaPoLIN(self.style_dim, self.dtype)(x, style)
            x = jax.nn.leaky_relu(x, 0.2)
        return x


class FST(nn.Module):
    '''bilinear up -> conv -> PoLIN -> conv -> AdaPoLIN (reference :83).'''
    features: int
    style_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        N, H, W, C = x.shape
        x = jax.image.resize(x, (N, H * 2, W * 2, C), method='bilinear')
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        x = PoLIN(self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        x = AdaPoLIN(self.style_dim, self.dtype)(x, style)
        return jax.nn.leaky_relu(x, 0.2)


class Generator(nn.Module):
    image_size: int = 128
    bottom_width: int = 8
    channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ref):
        num_downs = int(math.log2(self.image_size)
                        - math.log2(self.bottom_width))
        c = self.channels

        def encode(h, name):
            h = nn.Conv(c, (7, 7), padding=3, dtype=self.dtype,
                        name=f'{name}_in')(h.astype(self.dtype))
            h = jax.nn.leaky_relu(h, 0.2)
            cc = c
            for i in range(num_downs):
                cc *= 2
                h = nn.Conv(cc, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f'{name}_down{i}')(h)
                h = _instance_norm(h)
                h = jax.nn.leaky_relu(h, 0.2)
            return h, cc

        content, cc = encode(x, 'content')
        content = nn.Conv(cc, (3, 3), padding=1, dtype=self.dtype)(content)

        style_feat, _ = encode(ref, 'style')
        s = style_feat.reshape(style_feat.shape[0], -1).astype(jnp.float32)
        s = nn.Dense(cc * 2)(s)
        s = jax.nn.leaky_relu(s, 0.2)
        style = nn.Dense(cc * 2)(s)

        h = AST(cc, cc * 2, dtype=self.dtype)(content, style)
        for _ in range(num_downs):
            h = FST(cc, cc * 2, self.dtype)(h, style)
        h = nn.Conv(3, (7, 7), padding=3, dtype=self.dtype)(h)
        return jnp.tanh(h.astype(jnp.float32))


class Discriminator(nn.Module):
    '''Shared trunk + two domain branches (reference DiscHead + D).'''
    image_size: int = 128
    channels: int = 32
    max_channels: int = 512
    shared_downs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        h = nn.Conv(c, (7, 7), padding=3, dtype=self.dtype)(
            x.astype(self.dtype))
        h = jax.nn.leaky_relu(h, 0.2)
        shared_feats = []
        for i in range(self.shared_downs):
            c *= 2
            h = nn.Conv(min(self.max_channels, c), (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype)(h)
            h = _instance_norm(h)
            h = jax.nn.leaky_relu(h, 0.2)
            shared_feats.append(h)

        def branch(h, name):
            feats = []
            cc = c
            size = self.image_size // 2 ** self.shared_downs
            while size > 4:
                cc *= 2
                size //= 2
                h = nn.Conv(min(self.max_channels, cc), (3, 3), strides=(2, 2),
                            padding=1, dtype=self.dtype,
                            name=f'{name}_down{size}')(h)
                h = _instance_norm(h)
                h = jax.nn.leaky_relu(h, 0.2)
                feats.append(h)
            logit = nn.Conv(1, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f'{name}_out')(h)
            return logit.reshape(h.shape[0], -1).astype(jnp.float32), feats

        a_prob, a_feats = branch(h, 'branch_a')
        b_prob, b_feats = branch(h, 'branch_b')
        return a_prob, b_prob, shared_feats, a_feats, b_feats
