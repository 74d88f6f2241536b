'''normalizations ablation (reference `implementations/normalizations/model.py`):
LIN (:26, rho-mixed layer/instance norm) and PoLIN (:55, 1x1-conv fusion)
compared against bn/in/ln inside a simple reference-based I2I model
(content encoder + style encoder + adaptive-norm decoder).'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import Discriminator  # noqa: F401


def _instance_norm(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def _layer_norm(x):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class Normalization(nn.Module):
    '''kind in {bn,in,ln,lin,polin}; affine optional (reference
    get_normalization :81). rho of LIN is clamped to [0,1] at read time
    (replacing the reference's post_step clamp).'''
    kind: str = 'in'
    affine: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        C = x.shape[-1]
        if self.kind == 'bn':
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                use_bias=self.affine, use_scale=self.affine,
                                dtype=self.dtype)(x)
        if self.kind == 'in':
            out = _instance_norm(x)
        elif self.kind == 'ln':
            out = _layer_norm(x)
        elif self.kind == 'lin':
            rho = jnp.clip(self.param('rho', nn.initializers.constant(0.5),
                                      (1,)), 0.0, 1.0)
            out = _layer_norm(x) * rho + _instance_norm(x) * (1 - rho)
        elif self.kind == 'polin':
            fused = jnp.concatenate([_layer_norm(x), _instance_norm(x)],
                                    axis=-1)
            out = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype)(fused)
        else:
            raise Exception(f'Normalization: {self.kind}')
        if self.affine and self.kind != 'bn':
            gamma = self.param('gamma', nn.initializers.ones_init(),
                               (1, 1, 1, C))
            beta = self.param('beta', nn.initializers.zeros_init(),
                              (1, 1, 1, C))
            out = gamma * out + beta
        return out


class AdaptiveNormalization(nn.Module):
    '''norm + style-affine gamma/beta with gamma-bias init 1 (reference :89).'''
    kind: str = 'in'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, train: bool = True):
        C = x.shape[-1]
        norm = Normalization(self.kind, False, self.dtype)(x, train)
        aff = nn.Dense(C * 2, use_bias=False)(style.astype(jnp.float32))
        bias = self.param('affine_bias',
                          lambda k, s: jnp.concatenate(
                              [jnp.ones((C,)), jnp.zeros((C,))]), None)
        gb = aff + bias
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return gamma[:, None, None, :].astype(norm.dtype) * norm \
            + beta[:, None, None, :].astype(norm.dtype)


class Generator(nn.Module):
    image_size: int = 128
    bottom: int = 16
    in_channels: int = 1
    style_channels: int = 3
    channels: int = 32
    max_channels: int = 512
    style_dim: int = 128
    num_blocks: int = 4
    norm_name: str = 'in'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, content, style_img, train: bool = True):
        num = int(math.log2(self.image_size) - math.log2(self.bottom))

        # content encoder
        c = self.channels
        x = nn.Conv(c, (1, 1), dtype=self.dtype)(content.astype(self.dtype))
        x = jax.nn.relu(x)
        for _ in range(num):
            c *= 2
            och = min(self.max_channels, c)
            x = nn.Conv(och, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype)(x)
            x = Normalization(self.norm_name, dtype=self.dtype)(x, train)
            x = jax.nn.relu(x)

        # style encoder
        sc = self.channels
        s = nn.Conv(sc, (1, 1), dtype=self.dtype)(
            style_img.astype(self.dtype))
        s = jax.nn.relu(s)
        for _ in range(num):
            sc *= 2
            soch = min(self.max_channels, sc)
            s = nn.Conv(soch, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype)(s)
            s = Normalization(self.norm_name, dtype=self.dtype)(s, train)
            s = jax.nn.relu(s)
        s = s.reshape(s.shape[0], -1).astype(jnp.float32)
        style = jax.nn.relu(nn.Dense(self.style_dim)(s))

        # decoder with adaptive norm
        for _ in range(self.num_blocks):
            h = nn.Conv(och, (3, 3), padding=1, dtype=self.dtype)(x)
            h = AdaptiveNormalization(self.norm_name,
                                      self.dtype)(h, style, train)
            h = jax.nn.relu(h)
            h = nn.Conv(och, (3, 3), padding=1, dtype=self.dtype)(h)
            h = AdaptiveNormalization(self.norm_name,
                                      self.dtype)(h, style, train)
            x = (x + h) / (2 ** 0.5)
        for _ in range(num):
            c //= 2
            och = min(self.max_channels, c)
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = nn.Conv(och, (3, 3), padding=1, dtype=self.dtype)(x)
            x = AdaptiveNormalization(self.norm_name,
                                      self.dtype)(x, style, train)
            x = jax.nn.relu(x)
        x = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))
