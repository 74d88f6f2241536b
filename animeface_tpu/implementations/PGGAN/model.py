'''PGGAN (reference `implementations/PGGAN/model.py`): progressive-growing
G/D with equalized LR, pixel norm, minibatch-std, alpha-blended transitions.

TPU-native growth design (SURVEY §3.3): instead of mutating module lists
(`grow()`, model.py:303,372), the FULL max-resolution parameter set is created
once; `depth` is a STATIC argument selecting the active prefix of blocks, and
`alpha` is a traced scalar — so each (depth, mode) pair is one compiled
train-step and growing is a planned re-trace, with params/optimizer simply
re-threaded host-side.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

G_PARAMS = [(None, 512), (512, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
D_PARAMS = [(512, 512), (512, 512), (256, 512), (128, 256), (64, 128), (32, 64)]
RESOLUTIONS = [4, 8, 16, 32, 64, 128]


def pixel_norm(x):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-8)


class ELRConv(nn.Module):
    '''He-scaled runtime-coefficient conv (reference EqualizedLR :20).'''
    features: int
    kernel_size: int = 3
    padding: Any = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.normal(1.0),
                            (k, k, in_ch, self.features))
        bias = self.param('bias', nn.initializers.zeros_init(), (self.features,))
        coef = np.sqrt(2.0 / (in_ch * k * k))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (kernel * coef).astype(self.dtype), (1, 1),
            self.padding if not isinstance(self.padding, int)
            else ((self.padding,) * 2,) * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias.astype(y.dtype)


class GBlock(nn.Module):
    '''4x4 input block or x2 upsample block (reference ResolutionBlock :154).'''
    features: int
    is_first: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.is_first:
            # latent [N,1,1,latent] -> 4x4 via transposed 4x4 VALID conv
            in_ch = x.shape[-1]
            kernel = self.param('kernel_t', nn.initializers.normal(1.0),
                                (4, 4, in_ch, self.features))
            coef = np.sqrt(2.0 / in_ch)
            x = jax.lax.conv_transpose(
                x.astype(self.dtype), (kernel * coef).astype(self.dtype),
                (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = jax.nn.leaky_relu(pixel_norm(x), 0.2)
            x = ELRConv(self.features, 3, 1, self.dtype)(x)
            x = jax.nn.leaky_relu(pixel_norm(x), 0.2)
        else:
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = ELRConv(self.features, 3, 1, self.dtype)(x)
            x = jax.nn.leaky_relu(pixel_norm(x), 0.2)
            x = ELRConv(self.features, 3, 1, self.dtype)(x)
            x = jax.nn.leaky_relu(pixel_norm(x), 0.2)
        return x


class MiniBatchStd(nn.Module):
    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        std = jnp.std(x.astype(jnp.float32), axis=0, keepdims=True)
        stat = jnp.mean(std)
        feat = jnp.full((N, H, W, 1), stat, x.dtype)
        return jnp.concatenate([x, feat], axis=-1)


class DBlock(nn.Module):
    '''Downsample block / final 4x4->logit block (DownResolutionBlock :207).'''
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
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Generator(nn.Module):
    '''depth selects the active prefix; mode 't' alpha-blends the new block's
    RGB with the upsampled previous RGB (transition_forward :314).'''
    latent_dim: int = 100
    max_depth: int = 5            # 4px * 2^5 = 128px
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, depth: int, mode: str = 's', alpha=1.0):
        x = z.reshape(z.shape[0], 1, 1, -1)
        outs = []
        for d in range(depth + 1):
            feats = G_PARAMS[d][1]
            x = GBlock(feats, is_first=(d == 0), dtype=self.dtype,
                       name=f'block_{d}')(x)
            outs.append(x)
        rgb_cur = ELRConv(3, 1, 'VALID', self.dtype,
                          name=f'to_rgb_{depth}')(x)
        if mode == 't' and depth > 0:
            rgb_pre = ELRConv(3, 1, 'VALID', self.dtype,
                              name=f'to_rgb_{depth - 1}')(outs[-2])
            N, H, W, C = rgb_pre.shape
            rgb_pre = jax.image.resize(rgb_pre, (N, H * 2, W * 2, C),
                                       method='nearest')
            out = (1 - alpha) * rgb_pre + alpha * rgb_cur
        else:
            out = rgb_cur
        return out.astype(jnp.float32)

    def init_all(self, key, batch=1):
        '''Init params covering every depth/to_rgb (one pass at max depth in
        transition mode touches all blocks and both newest RGB heads; shallower
        heads are initialized by per-depth passes).'''
        z = jnp.zeros((batch, self.latent_dim))
        params = {}
        for d in range(self.max_depth + 1):
            v = self.init(key, z, depth=d, mode='t' if d > 0 else 's',
                          alpha=0.5)
            params.update(v['params'])
        return {'params': params}


class Discriminator(nn.Module):
    max_depth: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth: int, mode: str = 's', alpha=1.0):
        x_cur = ELRConv(D_PARAMS[depth][0], 1, 'VALID', self.dtype,
                        name=f'from_rgb_{depth}')(x.astype(self.dtype))
        x_cur = jax.nn.leaky_relu(x_cur, 0.2)
        h = DBlock(D_PARAMS[depth][1], is_last=(depth == 0),
                   dtype=self.dtype, name=f'block_{depth}')(x_cur)
        if mode == 't' and depth > 0:
            x_pre = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x_pre = ELRConv(D_PARAMS[depth - 1][0], 1, 'VALID', self.dtype,
                            name=f'from_rgb_{depth - 1}')(x_pre.astype(self.dtype))
            x_pre = jax.nn.leaky_relu(x_pre, 0.2)
            h = (1 - alpha) * x_pre + alpha * h
        for d in range(depth - 1, -1, -1):
            h = DBlock(D_PARAMS[d][1], is_last=(d == 0),
                       dtype=self.dtype, name=f'block_{d}')(h)
        return h.astype(jnp.float32)

    def init_all(self, key, image_size_base=4, batch=2):
        params = {}
        for d in range(self.max_depth + 1):
            size = image_size_base * 2 ** d
            x = jnp.zeros((batch, size, size, 3))
            v = self.init(key, x, depth=d, mode='t' if d > 0 else 's',
                          alpha=0.5)
            params.update(v['params'])
        return {'params': params}
