'''Unconditional BigGAN / BigGAN-deep (reference `implementations/BigGAN/model.py`:
ConditionalNorm2d :35, GBlock :79 / GBlockdeep :123, DBlock(deep) :180/:211,
SelfAttention :259, arch tables :353/:376/:458/:482). z feeds every
conditional-norm layer; hinge loss; EMA G. Flax NHWC; self-attention as
batched MXU einsums; arch tables extended down to 32/64px for small runs.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _arch(image_size: int):
    '''G/D channel-multiplier ladders (reference GEN_ARCH/DIS_ARCH).'''
    n_up = int(np.log2(image_size)) - 2          # from 4x4
    muls = [16, 16, 8, 8, 4, 2, 1, 1][:n_up + 1]
    gen = dict(inm=muls[:-1], out=muls[1:],
               resl=[2 ** (3 + i) for i in range(n_up)],
               att=min(64, image_size // 2))
    dmuls = list(reversed(muls))
    dis = dict(inm=[0] + dmuls[1:-1], out=dmuls[1:],
               down=[True] * (n_up - 1) + [False],
               resl=[2 ** int(np.log2(image_size)) // 2 ** (i + 1)
                     for i in range(n_up - 1)] + [4],
               att=min(64, image_size // 2))
    return gen, dis


class SNDense(nn.Module):
    features: int
    use_sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=nn.initializers.xavier_normal(),
                     dtype=self.dtype)
        if self.use_sn:
            return nn.SpectralNorm(d)(x, update_stats=train)
        return d(x)


class SNConv(nn.Module):
    features: int
    kernel_size: int = 3
    use_sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, use_bias=self.use_bias,
                    kernel_init=nn.initializers.xavier_normal(),
                    dtype=self.dtype)
        if self.use_sn:
            return nn.SpectralNorm(c)(x, update_stats=train)
        return c(x)


class ConditionalNorm(nn.Module):
    '''BN without affine, then z-conditional gain/bias (reference :35):
    out = norm(x) * (1 - gain(z)) + bias(z).'''
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        ch = x.shape[-1]
        norm = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            use_bias=False, use_scale=False,
                            dtype=self.dtype)(x)
        gain = SNDense(ch, self.use_sn, dtype=self.dtype)(z, train)
        bias = SNDense(ch, self.use_sn, dtype=self.dtype)(z, train)
        return norm * (1 - gain)[:, None, None, :] + bias[:, None, None, :]


def up2x(x):
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')


class GBlock(nn.Module):
    features: int
    upsample: bool = True
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        in_ch = x.shape[-1]
        h = ConditionalNorm(self.use_sn, self.dtype)(x, z, train)
        h = jax.nn.relu(h)
        if self.upsample:
            h = up2x(h)
            x = up2x(x)
        if self.upsample or in_ch != self.features:
            x = SNConv(self.features, 1, self.use_sn, dtype=self.dtype)(x, train)
        h = SNConv(self.features, 3, self.use_sn, dtype=self.dtype)(h, train)
        h = ConditionalNorm(self.use_sn, self.dtype)(h, z, train)
        h = jax.nn.relu(h)
        h = SNConv(self.features, 3, self.use_sn, dtype=self.dtype)(h, train)
        return h + x


class DBlock(nn.Module):
    features: int
    downsample: bool = True
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        h = jax.nn.relu(x)
        h = SNConv(self.features, 3, self.use_sn, dtype=self.dtype)(h, train)
        h = jax.nn.relu(h)
        h = SNConv(self.features, 3, self.use_sn, dtype=self.dtype)(h, train)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if in_ch != self.features:
            x = SNConv(self.features, 1, self.use_sn, dtype=self.dtype)(x, train)
        return h + x


class SelfAttention(nn.Module):
    '''SAGAN non-local block with pooled keys/values (reference :259).'''
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, C = x.shape
        theta = SNConv(C // 8, 1, self.use_sn, False, self.dtype)(x, train)
        phi = SNConv(C // 8, 1, self.use_sn, False, self.dtype)(x, train)
        g = SNConv(C // 2, 1, self.use_sn, False, self.dtype)(x, train)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.max_pool(g, (2, 2), strides=(2, 2))

        theta = theta.reshape(B, H * W, C // 8)
        phi = phi.reshape(B, H * W // 4, C // 8)
        g = g.reshape(B, H * W // 4, C // 2)
        beta = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', theta, phi,
                       preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum('bqk,bkc->bqc', beta.astype(g.dtype), g)
        out = out.reshape(B, H, W, C // 2)
        out = SNConv(C, 1, self.use_sn, False, self.dtype)(out, train)
        gamma = self.param('gamma', nn.initializers.zeros_init(), (1,))
        return gamma.astype(x.dtype) * out + x


class Generator(nn.Module):
    image_size: int = 128
    z_dim: int = 120
    channels: int = 64
    use_sn: bool = True
    use_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        gen, _ = _arch(self.image_size)
        ch = self.channels
        x = SNDense(4 * 4 * gen['inm'][0] * ch, self.use_sn,
                    dtype=self.dtype)(z.astype(self.dtype), train)
        x = x.reshape(-1, 4, 4, gen['inm'][0] * ch)
        att_done = not self.use_attention
        for out_mul, resl in zip(gen['out'], gen['resl']):
            x = GBlock(out_mul * ch, True, self.use_sn, self.dtype)(x, z, train)
            if resl == gen['att'] and not att_done:
                att_done = True
                x = SelfAttention(self.use_sn, self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = SNConv(3, 3, self.use_sn, dtype=self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    image_size: int = 128
    channels: int = 64
    use_sn: bool = True
    use_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        _, dis = _arch(self.image_size)
        ch = self.channels
        x = x.astype(self.dtype)
        att_done = not self.use_attention
        for i, (out_mul, down, resl) in enumerate(
                zip(dis['out'], dis['down'], dis['resl'])):
            x = DBlock(out_mul * ch, down, self.use_sn, self.dtype)(x, train)
            if resl == dis['att'] and not att_done:
                att_done = True
                x = SelfAttention(self.use_sn, self.dtype)(x, train)
        x = jax.nn.relu(x)
        x = jnp.sum(x, axis=(1, 2))    # global sum pool
        x = SNDense(1, self.use_sn, dtype=self.dtype)(x, train)
        return x.astype(jnp.float32)
