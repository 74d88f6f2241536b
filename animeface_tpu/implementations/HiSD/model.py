'''HiSD (reference `implementations/HiSD/model.py`): hierarchical style
disentanglement — shared encoder/decoder, per-category {Mapper, Extractor,
Translator} modules (:180-355), multi-tag PatchGAN D with per-category tails
and tag-condition concat (:432).

TPU design: the tag index j is a TRACED value — Mapper/Extractor/D compute all
per-tag heads and select with jnp.take, so only the category index i is a
static compile key (O(categories) compiled steps instead of O(i*j*j')).'''

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


class ResBlock(nn.Module):
    features: int
    down: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _inorm(self.dtype)(x)
        h = jax.nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(h)
        h = _inorm(self.dtype)(h)
        h = jax.nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(h)
        if self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if in_ch != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype)(x)
        return (h + x) / np.sqrt(2)


class AdaINResBlock(nn.Module):
    '''AdaIN-conditioned residual block (reference ResBlockAdaIN :91).'''
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, gb):
        C = x.shape[-1]
        gamma, beta = jnp.split(gb, 2, axis=-1)

        def adain(h):
            mean = jnp.mean(h, axis=(1, 2), keepdims=True)
            var = jnp.var(h, axis=(1, 2), keepdims=True)
            hn = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            return gamma[:, None, None, :].astype(h.dtype) * hn \
                + beta[:, None, None, :].astype(h.dtype)

        h = adain(x)
        h = jax.nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(h)
        h = adain(h)
        h = jax.nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(h)
        return (h + x) / np.sqrt(2)


class Encoder(nn.Module):
    channels: int = 32
    num_downs: int = 2
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        return self.channels * 2 ** self.num_downs

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = nn.Conv(c, (1, 1), dtype=self.dtype)(x.astype(self.dtype))
        for _ in range(self.num_downs):
            c *= 2
            x = ResBlock(c, down=True, dtype=self.dtype)(x)
        return x


class Decoder(nn.Module):
    out_channels: int = 3
    num_ups: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        for _ in range(self.num_ups):
            c //= 2
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = ResBlock(c, dtype=self.dtype)(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Mapper(nn.Module):
    '''z -> style for tag j; all tag heads computed, j selected (:181).'''
    num_tag: int
    style_dim: int
    mid_dim: int = 256
    num_shared_layers: int = 3
    num_tag_layers: int = 3

    @nn.compact
    def __call__(self, z, j):
        h = z.astype(jnp.float32)
        for _ in range(self.num_shared_layers):
            h = jax.nn.relu(nn.Dense(self.mid_dim)(h))
        outs = []
        for t in range(self.num_tag):
            o = h
            for _ in range(self.num_tag_layers - 1):
                o = jax.nn.relu(nn.Dense(self.mid_dim,
                                         name=f'tag{t}_mid{_}')(o))
            outs.append(nn.Dense(self.style_dim, name=f'tag{t}_out')(o))
        stacked = jnp.stack(outs, axis=0)            # [T, B, style]
        return jnp.take(stacked, j, axis=0)


class Extractor(nn.Module):
    '''image -> per-tag styles, j selected (:229).'''
    num_tag: int
    style_dim: int
    image_size: int = 128
    channels: int = 32
    bottom_width: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, j):
        num_downs = int(np.log2(self.image_size)
                        - np.log2(self.bottom_width))
        c = self.channels
        x = nn.Conv(c, (1, 1), dtype=self.dtype)(x.astype(self.dtype))
        for _ in range(num_downs):
            c *= 2
            x = ResBlock(c, down=True, dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        x = nn.Dense(self.style_dim * self.num_tag)(x)
        x = x.reshape(-1, self.num_tag, self.style_dim)
        return jnp.take(x, j, axis=1)


class Translator(nn.Module):
    '''Masked residual translation conditioned on the style (:271).'''
    channels: int
    style_dim: int
    num_blocks: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        aff = nn.Dense(self.channels * 2, use_bias=False)(
            style.astype(jnp.float32))
        bias = self.param('affine_bias',
                          lambda k, s: jnp.concatenate(
                              [jnp.ones((self.channels,)),
                               jnp.zeros((self.channels,))]), None)
        gb = aff + bias
        for _ in range(self.num_blocks):
            h = AdaINResBlock(self.channels, self.dtype)(h, gb)
        mask = jax.nn.sigmoid(nn.Conv(self.channels, (1, 1),
                                      dtype=self.dtype)(h))
        feat = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(h)
        return feat * mask + x * (1 - mask)


class Generator(nn.Module):
    tags: Sequence[int] = (9, 10, 2)     # tags per category (hair/eye/glass)
    image_size: int = 128
    image_channels: int = 3
    style_dim: int = 256
    latent_dim: int = 32
    enc_num_downs: int = 2
    channels: int = 32
    trans_num_blocks: int = 7
    dtype: Any = jnp.float32

    def setup(self):
        self.encode = Encoder(self.channels, self.enc_num_downs, self.dtype)
        self.decode = Decoder(self.image_channels, self.enc_num_downs,
                              self.dtype)
        mid = self.channels * 2 ** self.enc_num_downs
        self.mappers = [Mapper(t, self.style_dim, name=f'map_{i}')
                        for i, t in enumerate(self.tags)]
        self.extractors = [
            Extractor(t, self.style_dim, self.image_size, self.channels,
                      dtype=self.dtype, name=f'extract_{i}')
            for i, t in enumerate(self.tags)]
        self.translators = [
            Translator(mid, self.style_dim, self.trans_num_blocks,
                       self.dtype, name=f'translate_{i}')
            for i in range(len(self.tags))]

    def __call__(self, x, refs=None):
        '''refs: list over categories of None or (data, j) where data is a
        latent [B, latent_dim] (mapper path) or image [B,H,W,C] (extractor).'''
        h = self.encode(x)
        if refs is not None:
            for i, ref in enumerate(refs):
                if ref is None:
                    continue
                data, j = ref
                if data.ndim == 2:
                    style = self.mappers[i](data, j)
                else:
                    style = self.extractors[i](data, j)
                h = self.translators[i](h, style)
        return self.decode(h)

    def init_forward(self, x, z):
        '''Touch every submodule once (for .init): mapper + extractor +
        translator per category, then decode.'''
        h = self.encode(x)
        for i in range(len(self.tags)):
            s1 = self.mappers[i](z, jnp.int32(0))
            s2 = self.extractors[i](x, jnp.int32(0))
            h = self.translators[i](h, s1 + s2)
        return self.decode(h)

    def map_style(self, i: int, z, j):
        return self.mappers[i](z, j)

    def extract_style(self, i: int, x, j):
        return self.extractors[i](x, j)


class Discriminator(nn.Module):
    '''PatchGAN with per-category tails; tag one-hot concatenated before the
    tail, [num_tag*2] output channels, (j, branch) selected traced (:432).'''
    tags: Sequence[int] = (9, 10, 2)
    image_channels: int = 3
    num_layers: int = 3
    channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, i: int, j):
        c = self.channels
        x = nn.Conv(c, (4, 4), strides=(2, 2), dtype=self.dtype)(
            x.astype(self.dtype))
        x = jax.nn.leaky_relu(x, 0.2)
        for _ in range(self.num_layers - 1):
            c *= 2
            x = nn.Conv(c, (4, 4), strides=(2, 2), dtype=self.dtype)(x)
            x = _inorm(self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        num_tag = self.tags[i]
        onehot = jax.nn.one_hot(j, num_tag)
        N, H, W, _ = x.shape
        cond = jnp.broadcast_to(onehot[None, None, None, :],
                                (N, H, W, num_tag)).astype(x.dtype)
        h = jnp.concatenate([x, cond], axis=-1)
        h = nn.Conv(c * 2, (4, 4), dtype=self.dtype, name=f'tail_{i}_0')(h)
        h = _inorm(self.dtype)(h)
        h = jax.nn.leaky_relu(h, 0.2)
        out = nn.Conv(num_tag * 2, (4, 4), dtype=self.dtype,
                      name=f'tail_{i}_1')(h)
        out = out.astype(jnp.float32)
        # select tag j's (fake, cycle) channel pair
        out = out.reshape(out.shape[:3] + (num_tag, 2))
        return jnp.take(out, j, axis=3)       # [N,h,w,2]
