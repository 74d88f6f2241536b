'''StyleGAN v1 (reference `implementations/StyleGAN/model.py`): progressive-
growing style-based G — 8-layer mapping, per-block noise + LeakyReLU + AdaIN
epilogue (LayerEpilogue :113), blur-coupled up/downsampling — with the same
static-depth re-traced growth design as PGGAN (SURVEY §3.3).'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.ops import setup_filter, filter2d, upsample2d, downsample2d
from animeface_tpu.implementations.PGGAN.model import (
    ELRConv, pixel_norm, MiniBatchStd,
)

G_CH = [(512, 512), (512, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
D_CH = [(512, 512), (512, 512), (256, 512), (128, 256), (64, 128), (32, 64)]
RESOLUTIONS = [4, 8, 16, 32, 64, 128]
_BLUR = [1., 2., 1.]


class ELRDense(nn.Module):
    features: int
    lr_mul: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.normal(1.0 / self.lr_mul),
                            (in_f, self.features))
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,))
        coef = np.sqrt(2.0 / in_f) * self.lr_mul
        return x.astype(self.dtype) @ (kernel * coef).astype(self.dtype) \
            + (bias * self.lr_mul).astype(self.dtype)


class AdaIN(nn.Module):
    '''Instance norm + style-conditional scale/shift (reference :47).'''
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        C = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        ys = ELRDense(C * 2, dtype=jnp.float32)(style.astype(jnp.float32))
        scale, shift = jnp.split(ys, 2, axis=-1)
        scale = (scale + 1.0)[:, None, None, :].astype(x.dtype)
        shift = shift[:, None, None, :].astype(x.dtype)
        return xn * scale + shift


class LayerEpilogue(nn.Module):
    '''scaled noise -> lrelu -> AdaIN (reference :113).'''
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        scale = self.param('noise_scale', nn.initializers.zeros_init(), ())
        noise = jax.random.normal(self.make_rng('noise'),
                                  x.shape[:3] + (1,), x.dtype)
        x = x + noise * scale.astype(x.dtype)
        x = jax.nn.leaky_relu(x, 0.2)
        return AdaIN(self.dtype)(x, style)


def upsample_blur(x):
    return upsample2d(x, setup_filter(_BLUR), up=2)


def blur_downsample(x):
    return downsample2d(x, setup_filter(_BLUR), down=2)


class GBlock(nn.Module):
    features: int
    is_first: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        if not self.is_first:
            x = upsample_blur(x)
            x = ELRConv(self.features, 3, 1, self.dtype)(x)
        x = LayerEpilogue(self.dtype)(x, style)
        x = ELRConv(self.features, 3, 1, self.dtype)(x)
        x = LayerEpilogue(self.dtype)(x, style)
        return x


class Mapping(nn.Module):
    style_dim: int = 512
    num_layers: int = 8

    @nn.compact
    def __call__(self, z):
        x = pixel_norm(z.astype(jnp.float32))
        for _ in range(self.num_layers):
            x = ELRDense(self.style_dim, lr_mul=0.01)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        return x


class Generator(nn.Module):
    latent_dim: int = 512
    style_dim: int = 512
    max_depth: int = 5
    map_num_layers: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, depth: int, mode: str = 's', alpha=1.0):
        style = Mapping(self.style_dim, self.map_num_layers,
                        name='mapping')(z)
        const = self.param('const', nn.initializers.ones_init(),
                           (1, 4, 4, self.style_dim))
        x = jnp.broadcast_to(const, (z.shape[0],) + const.shape[1:]).astype(
            self.dtype)
        outs = []
        for d in range(depth + 1):
            x = GBlock(G_CH[d][1], is_first=(d == 0), dtype=self.dtype,
                       name=f'block_{d}')(x, style)
            outs.append(x)
        rgb_cur = ELRConv(3, 1, 'VALID', self.dtype,
                          name=f'to_rgb_{depth}')(x)
        if mode == 't' and depth > 0:
            rgb_pre = ELRConv(3, 1, 'VALID', self.dtype,
                              name=f'to_rgb_{depth - 1}')(outs[-2])
            rgb_pre = upsample_blur(rgb_pre)
            out = (1 - alpha) * rgb_pre + alpha * rgb_cur
        else:
            out = rgb_cur
        return out.astype(jnp.float32)

    def init_all(self, key, batch=1):
        z = jnp.zeros((batch, self.latent_dim))
        params = {}
        for d in range(self.max_depth + 1):
            v = self.init({'params': key, 'noise': key}, z, depth=d,
                          mode='t' if d > 0 else 's', alpha=0.5)
            params.update(v['params'])
        return {'params': params}


class DBlock(nn.Module):
    features: int
    is_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.is_last:
            x = MiniBatchStd()(x)
            x = ELRConv(self.features, 3, 1, self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
            x = ELRConv(self.features, 4, 'VALID', self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
            x = ELRConv(1, 1, 'VALID', self.dtype)(x)
            return x.reshape(x.shape[0], -1)
        x = ELRConv(self.features, 3, 1, self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = ELRConv(self.features, 3, 1, self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        return blur_downsample(x)


class Discriminator(nn.Module):
    max_depth: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth: int, mode: str = 's', alpha=1.0):
        x_cur = ELRConv(D_CH[depth][0], 1, 'VALID', self.dtype,
                        name=f'from_rgb_{depth}')(x.astype(self.dtype))
        x_cur = jax.nn.leaky_relu(x_cur, 0.2)
        h = DBlock(D_CH[depth][1], is_last=(depth == 0),
                   dtype=self.dtype, name=f'block_{depth}')(x_cur)
        if mode == 't' and depth > 0:
            x_pre = blur_downsample(x)
            x_pre = ELRConv(D_CH[depth - 1][0], 1, 'VALID', self.dtype,
                            name=f'from_rgb_{depth - 1}')(x_pre.astype(self.dtype))
            x_pre = jax.nn.leaky_relu(x_pre, 0.2)
            h = (1 - alpha) * x_pre + alpha * h
        for d in range(depth - 1, -1, -1):
            h = DBlock(D_CH[d][1], is_last=(d == 0),
                       dtype=self.dtype, name=f'block_{d}')(h)
        return h.astype(jnp.float32)

    def init_all(self, key, batch=2):
        params = {}
        for d in range(self.max_depth + 1):
            size = 4 * 2 ** d
            v = self.init(key, jnp.zeros((batch, size, size, 3)), depth=d,
                          mode='t' if d > 0 else 's', alpha=0.5)
            params.update(v['params'])
        return {'params': params}
