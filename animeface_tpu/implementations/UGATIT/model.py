'''UGATIT (reference `implementations/UGATIT/model.py`): CAM attention
(class-activation gating with avg/max-pool logits :29), layer-instance norm
mixtures LIN/AdaLIN (:78/:99), encoder-CAM-AdaLIN-decoder generator (:153),
patch D with CAM and an avg-pool MultiScaleD (:276) that concatenates the
flattened per-scale logits. NOTE: the reference's SNConv2d is a plain conv —
spectral norm is commented out (:23-26) — so D uses no SN here either.
Flax NHWC. Knobs: bottom, act_name, norm_name, light (GAP before the
gamma/beta MLP, :189-192).'''

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module.layers import get_activation


def _reflect_conv(x, features, kernel, stride, dtype, use_bias=False):
    pad = 1 if kernel in (3, 4) else kernel // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='reflect')
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding='VALID', use_bias=use_bias, dtype=dtype)(x)


def _instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _layer_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _norm(name: str, x):
    '''encoder norm by name (reference get_normalization :15; affine-free,
    matching torch InstanceNorm2d/GroupNorm(affine default) semantics for the
    names the recipe uses).'''
    if name == 'in':
        return _instance_norm(x)
    if name == 'ln':
        return _layer_norm(x)
    raise ValueError(f'norm {name!r}')


class CAM(nn.Module):
    '''Class-activation gating: per-channel weights of avg/max-pool logit
    heads reweight the features; logits train adversarially (reference :29).'''
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
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
        h = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = get_activation(self.act_name)(h)
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
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, gamma, beta):
        def adalin(h, name):
            h = LIN(affine=False, name=name)(h)
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        h = _reflect_conv(x, self.channels, 3, 1, self.dtype)
        h = adalin(h, 'adalin_0')
        h = get_activation(self.act_name)(h)
        h = _reflect_conv(h, self.channels, 3, 1, self.dtype)
        h = adalin(h, 'adalin_1')
        return x + h


class ResBlock(nn.Module):
    channels: int
    norm_name: str = 'in'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _reflect_conv(x, self.channels, 3, 1, self.dtype)
        h = _norm(self.norm_name, h)
        h = get_activation(self.act_name)(h)
        h = _reflect_conv(h, self.channels, 3, 1, self.dtype)
        h = _norm(self.norm_name, h)
        return x + h


class Generator(nn.Module):
    image_size: int = 128
    bottom: Optional[int] = None
    channels: int = 64
    max_channels: int = 512
    resblocks: int = 6
    adalinresblocks: int = 6
    act_name: str = 'relu'
    norm_name: str = 'in'
    light: bool = False
    io_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_heatmap: bool = False):
        bottom = self.bottom if self.bottom else self.image_size // 4
        num_sampling = int(math.log2(self.image_size) - math.log2(bottom))
        act = get_activation(self.act_name)
        c = self.channels
        x = _reflect_conv(x.astype(self.dtype), c, 3, 1, self.dtype)
        x = act(x)
        resl = self.image_size
        och = c
        for _ in range(num_sampling):
            c *= 2
            resl //= 2
            och = min(self.max_channels, c)
            x = _reflect_conv(x, och, 3, 2, self.dtype)
            x = _norm(self.norm_name, x)
            x = act(x)
        for _ in range(self.resblocks):
            x = ResBlock(och, self.norm_name, self.act_name, self.dtype)(x)
        x, cam_logit, heatmap = CAM(self.act_name, self.dtype)(x)
        # gamma/beta MLP; --light pools before flatten (reference :189-192)
        feat = jnp.mean(x, axis=(1, 2)) if self.light else x
        flat = feat.reshape(feat.shape[0], -1).astype(jnp.float32)
        h = nn.Dense(och, use_bias=False)(flat)
        h = act(h)
        gb = nn.Dense(och * 2, use_bias=False)(h)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        gamma = gamma.astype(x.dtype)
        beta = beta.astype(x.dtype)
        for i in range(self.adalinresblocks):
            x = AdaLINResBlock(och, self.act_name, self.dtype)(x, gamma, beta)
        for _ in range(num_sampling):
            c //= 2
            och = min(self.max_channels, c)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = _reflect_conv(x, och, 3, 1, self.dtype)
            x = LIN(affine=True)(x)
            x = act(x)
        x = _reflect_conv(x, self.io_channels, 3, 1, self.dtype)
        out = jnp.tanh(x.astype(jnp.float32))
        if return_heatmap:
            return out, cam_logit.astype(jnp.float32), heatmap
        return out, cam_logit.astype(jnp.float32)


class Discriminator(nn.Module):
    '''Patch D with CAM; plain convs (reference SNConv2d == Conv2d, :25).'''
    num_layers: int = 3
    channels: int = 64
    max_channels: int = 512
    act_name: str = 'lrelu'
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act_name)
        c = self.channels
        x = _reflect_conv(x.astype(self.dtype), c, 4, 2, self.dtype,
                          use_bias=True)
        x = act(x)
        for _ in range(self.num_layers - 1):
            c *= 2
            och = min(self.max_channels, c)
            x = _reflect_conv(x, och, 4, 2, self.dtype, True)
            x = act(x)
        c *= 2
        och = min(self.max_channels, c)
        x = _reflect_conv(x, och, 4, 1, self.dtype, True)
        x = act(x)
        x, cam_logit, _ = CAM(self.act_name, self.dtype)(x)
        x = _reflect_conv(x, 1, 4, 1, self.dtype, True)
        return x.astype(jnp.float32), cam_logit.astype(jnp.float32)


class MultiScaleD(nn.Module):
    '''Avg-pool pyramid of Discriminators; flattened logits concatenated
    across scales (reference :276-295).'''
    num_scale: int = 2
    num_layers: int = 3
    channels: int = 64
    max_channels: int = 512
    act_name: str = 'lrelu'
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        probs, cams = [], []
        for i in range(self.num_scale):
            p, c = Discriminator(self.num_layers, self.channels,
                                 self.max_channels, self.act_name,
                                 self.in_channels, self.dtype,
                                 name=f'scale_{i}')(x)
            probs.append(p.reshape(p.shape[0], -1))
            cams.append(c.reshape(c.shape[0], -1))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return (jnp.concatenate(probs, axis=1),
                jnp.concatenate(cams, axis=1))
