'''UGATIT (reference `implementations/UGATIT/model.py`): CAM attention
(class-activation gating with avg/max-pool logits :29), layer-instance norm
mixtures LIN/AdaLIN (:78/:99), encoder-CAM-AdaLIN-decoder generator (:153),
SN patch D with CAM. Flax NHWC.'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _reflect_conv(x, features, kernel, stride, dtype, use_bias=False, sn=False,
                  train=True):
    pad = 1 if kernel in (3, 4) else kernel // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='reflect')
    conv = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding='VALID', use_bias=use_bias, dtype=dtype)
    if sn:
        return nn.SpectralNorm(conv)(x, update_stats=train)
    return conv(x)


def _instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _layer_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class CAM(nn.Module):
    '''Class-activation gating: per-channel weights of avg/max-pool logit
    heads reweight the features; logits train adversarially (reference :29).'''
    sn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        C = x.shape[-1]
        gap = jnp.mean(x, axis=(1, 2))
        gmp = jnp.max(x, axis=(1, 2))
        gap_fc = self.param('gap_fc', nn.initializers.lecun_normal(), (C, 1))
        gmp_fc = self.param('gmp_fc', nn.initializers.lecun_normal(), (C, 1))
        gap_logit = gap.astype(jnp.float32) @ gap_fc
        gmp_logit = gmp.astype(jnp.float32) @ gmp_fc
        gap_x = x * gap_fc[:, 0][None, None, None, :].astype(x.dtype)
        gmp_x = x * jax.lax.stop_gradient(
            gmp_fc[:, 0])[None, None, None, :].astype(x.dtype)
        cam_logit = jnp.concatenate([gap_logit, gmp_logit], axis=1)
        h = jnp.concatenate([gap_x, gmp_x], axis=-1)
        conv = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype)
        h = (nn.SpectralNorm(conv)(h, update_stats=train)
             if self.sn else conv(h))
        h = jax.nn.relu(h)
        heatmap = jnp.sum(h, axis=-1, keepdims=True)
        return h, cam_logit, heatmap


class LIN(nn.Module):
    '''rho-mixed layer/instance norm (reference :78).'''
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        rho = self.param('rho', nn.initializers.constant(0.5), (1, 1, 1, C))
        out = rho * _instance_norm(x) + (1 - rho) * _layer_norm(x)
        if self.affine:
            gamma = self.param('gamma', nn.initializers.ones_init(),
                               (1, 1, 1, C))
            beta = self.param('beta', nn.initializers.zeros_init(),
                              (1, 1, 1, C))
            out = gamma * out + beta
        return out


class AdaLINResBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, gamma, beta):
        def adalin(h, name):
            h = LIN(affine=False, name=name)(h)
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        h = _reflect_conv(x, self.channels, 3, 1, self.dtype)
        h = adalin(h, 'adalin_0')
        h = jax.nn.relu(h)
        h = _reflect_conv(h, self.channels, 3, 1, self.dtype)
        h = adalin(h, 'adalin_1')
        return x + h


class ResBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _reflect_conv(x, self.channels, 3, 1, self.dtype)
        h = _instance_norm(h)
        h = jax.nn.relu(h)
        h = _reflect_conv(h, self.channels, 3, 1, self.dtype)
        h = _instance_norm(h)
        return x + h


class Generator(nn.Module):
    image_size: int = 128
    channels: int = 64
    max_channels: int = 512
    resblocks: int = 6
    adalinresblocks: int = 6
    io_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bottom = self.image_size // 4
        num_sampling = int(math.log2(self.image_size) - math.log2(bottom))
        c = self.channels
        x = _reflect_conv(x.astype(self.dtype), c, 3, 1, self.dtype)
        x = jax.nn.relu(x)
        resl = self.image_size
        for _ in range(num_sampling):
            c *= 2
            resl //= 2
            och = min(self.max_channels, c)
            x = _reflect_conv(x, och, 3, 2, self.dtype)
            x = _instance_norm(x)
            x = jax.nn.relu(x)
        for _ in range(self.resblocks):
            x = ResBlock(och, self.dtype)(x)
        x, cam_logit, heatmap = CAM(False, self.dtype)(x, train)
        flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
        h = nn.Dense(och, use_bias=False)(flat)
        h = jax.nn.relu(h)
        gb = nn.Dense(och * 2, use_bias=False)(h)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        gamma = gamma.astype(x.dtype)
        beta = beta.astype(x.dtype)
        for i in range(self.adalinresblocks):
            x = AdaLINResBlock(och, self.dtype)(x, gamma, beta)
        for _ in range(num_sampling):
            c //= 2
            och = min(self.max_channels, c)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = _reflect_conv(x, och, 3, 1, self.dtype)
            x = LIN(affine=True)(x)
            x = jax.nn.relu(x)
        x = _reflect_conv(x, self.io_channels, 3, 1, self.dtype)
        return jnp.tanh(x.astype(jnp.float32)), cam_logit.astype(jnp.float32)


class Discriminator(nn.Module):
    num_layers: int = 3
    channels: int = 64
    max_channels: int = 512
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.channels
        x = _reflect_conv(x.astype(self.dtype), c, 4, 2, self.dtype,
                          use_bias=True, sn=True, train=train)
        x = jax.nn.leaky_relu(x, 0.2)
        for _ in range(self.num_layers - 1):
            c *= 2
            och = min(self.max_channels, c)
            x = _reflect_conv(x, och, 4, 2, self.dtype, True, True, train)
            x = jax.nn.leaky_relu(x, 0.2)
        c *= 2
        och = min(self.max_channels, c)
        x = _reflect_conv(x, och, 4, 1, self.dtype, True, True, train)
        x = jax.nn.leaky_relu(x, 0.2)
        x, cam_logit, _ = CAM(True, self.dtype)(x, train)
        x = _reflect_conv(x, 1, 4, 1, self.dtype, True, True, train)
        return x.astype(jnp.float32), cam_logit.astype(jnp.float32)
