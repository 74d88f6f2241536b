'''HiSD (reference `implementations/HiSD/model.py`): hierarchical style
disentanglement — shared encoder/decoder (:118/:145), per-category {Mapper
:180, Extractor :229, Translator :271} modules, multi-tag PatchGAN D with
per-category tails and tag-condition concat (:432). Full reference knob
surface: norm_name/act_name/bias, normalize_latent (PixelNorm on z, :174),
single_path (one branch for all tags, :189/:239/:456), affine_each (AdaIN
affine per layer instead of once per translator, :281), ret_feat (D returns
intermediate features for pix2pixHD-style feature matching, :450).

TPU design: the tag index j is a TRACED value — Mapper/Extractor/D compute
all per-tag heads and select with jnp.take, so only the category index i is
a static compile key (O(categories) compiled steps instead of O(i*j*j')).
Residual adds reproduce the reference's literal `h + x / sqrt(2)` (:89,
:116 — only the skip is scaled).'''

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module.layers import (
    get_activation, get_normalization,
)


def _upsample2(x):
    '''bilinear 2x (reference nn.Upsample(..., mode='bilinear',
    align_corners=False) inside ResBlock :65).'''
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, H * 2, W * 2, C), method='bilinear')


class ResBlock(nn.Module):
    '''norm-act-conv -> resample -> norm-act-conv, skip 1x1+resample;
    h + x/sqrt(2) (reference :46).'''
    features: int
    down: bool = False
    up: bool = False
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert not (self.down and self.up)
        in_ch = x.shape[-1]
        act = get_activation(self.act_name)
        h = get_normalization(self.norm_name, in_ch, dtype=self.dtype)(x)
        h = act(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=self.use_bias,
                    dtype=self.dtype)(h)
        if self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        if self.up:
            h = _upsample2(h)
        h = get_normalization(self.norm_name, self.features,
                              dtype=self.dtype)(h)
        h = act(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=self.use_bias,
                    dtype=self.dtype)(h)
        if in_ch != self.features or self.down or self.up:
            x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                        dtype=self.dtype)(x)
            if self.down:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            if self.up:
                x = _upsample2(x)
        return h + x / np.sqrt(2)


class AdaINResBlock(nn.Module):
    '''AdaIN-conditioned residual block (reference ResBlockAdaIN :91).
    `affine_each`: `style` is the raw style code and each AdaIN applies its
    own identity-initialised affine; otherwise `style` is the precomputed
    (gamma|beta) vector shared across the translator.'''
    features: int
    affine_each: bool = False
    act_name: str = 'lrelu'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        act = get_activation(self.act_name)

        def adain(h, idx):
            C = h.shape[-1]
            if self.affine_each:
                aff = nn.Dense(C * 2, use_bias=False,
                               name=f'affine_{idx}')(
                    style.astype(jnp.float32))
                bias = self.param(
                    f'affine_bias_{idx}',
                    lambda k, s: jnp.concatenate(
                        [jnp.ones((C,)), jnp.zeros((C,))]), None)
                gb = aff + bias
            else:
                gb = style
            gamma, beta = jnp.split(gb, 2, axis=-1)
            mean = jnp.mean(h, axis=(1, 2), keepdims=True)
            var = jnp.var(h, axis=(1, 2), keepdims=True)
            hn = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            return gamma[:, None, None, :].astype(h.dtype) * hn \
                + beta[:, None, None, :].astype(h.dtype)

        h = adain(x, 0)
        h = act(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=self.use_bias,
                    dtype=self.dtype)(h)
        h = adain(h, 1)
        h = act(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=self.use_bias,
                    dtype=self.dtype)(h)
        return h + x / np.sqrt(2)


class Encoder(nn.Module):
    channels: int = 32
    num_downs: int = 2
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        return self.channels * 2 ** self.num_downs

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = nn.Conv(c, (1, 1), use_bias=self.use_bias, dtype=self.dtype)(
            x.astype(self.dtype))
        for _ in range(self.num_downs):
            c *= 2
            x = ResBlock(c, down=True, norm_name=self.norm_name,
                         act_name=self.act_name, use_bias=self.use_bias,
                         dtype=self.dtype)(x)
        return x


class Decoder(nn.Module):
    out_channels: int = 3
    num_ups: int = 2
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        for _ in range(self.num_ups):
            c //= 2
            x = ResBlock(c, up=True, norm_name=self.norm_name,
                         act_name=self.act_name, use_bias=self.use_bias,
                         dtype=self.dtype)(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


def pixel_norm(z):
    '''reference PixelNorm :174 (note: .add_ AFTER sqrt).'''
    return z / (jnp.sqrt(jnp.mean(z ** 2, axis=1, keepdims=True)) + 1e-4)


class Mapper(nn.Module):
    '''z -> style for tag j; all tag heads computed, j selected (:180).'''
    num_tag: int
    style_dim: int
    mid_dim: int = 256
    num_shared_layers: int = 3
    num_tag_layers: int = 3
    act_name: str = 'relu'
    use_bias: bool = True
    normalize_latent: bool = False
    single_path: bool = False

    @nn.compact
    def __call__(self, z, j):
        num_tag = 1 if self.single_path else self.num_tag
        if self.single_path:
            j = jnp.int32(0)
        act = get_activation(self.act_name)
        h = z.astype(jnp.float32)
        if self.normalize_latent:
            h = pixel_norm(h)
        for _ in range(self.num_shared_layers):
            h = act(nn.Dense(self.mid_dim, use_bias=self.use_bias)(h))
        outs = []
        for t in range(num_tag):
            o = h
            for layer in range(self.num_tag_layers - 1):
                o = act(nn.Dense(self.mid_dim, use_bias=self.use_bias,
                                 name=f'tag{t}_mid{layer}')(o))
            outs.append(nn.Dense(self.style_dim, use_bias=self.use_bias,
                                 name=f'tag{t}_out')(o))
        stacked = jnp.stack(outs, axis=0)            # [T, B, style]
        return jnp.take(stacked, j, axis=0)


class Extractor(nn.Module):
    '''image -> per-tag styles, j selected (:229).'''
    num_tag: int
    style_dim: int
    image_size: int = 128
    channels: int = 32
    bottom_width: int = 8
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    use_bias: bool = True
    single_path: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, j):
        num_tag = 1 if self.single_path else self.num_tag
        if self.single_path:
            j = jnp.int32(0)
        num_downs = int(np.log2(self.image_size)
                        - np.log2(self.bottom_width))
        c = self.channels
        x = nn.Conv(c, (1, 1), use_bias=self.use_bias, dtype=self.dtype)(
            x.astype(self.dtype))
        for _ in range(num_downs):
            c *= 2
            x = ResBlock(c, down=True, norm_name=self.norm_name,
                         act_name=self.act_name, use_bias=self.use_bias,
                         dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        x = nn.Dense(self.style_dim * num_tag, use_bias=self.use_bias)(x)
        x = x.reshape(-1, num_tag, self.style_dim)
        return jnp.take(x, j, axis=1)


class Translator(nn.Module):
    '''Masked residual translation conditioned on the style (:271).'''
    channels: int
    style_dim: int
    num_blocks: int = 7
    act_name: str = 'lrelu'
    use_bias: bool = True
    affine_each: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        h = nn.Conv(self.channels, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        if not self.affine_each:
            aff = nn.Dense(self.channels * 2, use_bias=False)(
                style.astype(jnp.float32))
            bias = self.param('affine_bias',
                              lambda k, s: jnp.concatenate(
                                  [jnp.ones((self.channels,)),
                                   jnp.zeros((self.channels,))]), None)
            cond = aff + bias
        else:
            cond = style
        for _ in range(self.num_blocks):
            h = AdaINResBlock(self.channels, self.affine_each, self.act_name,
                              self.use_bias, self.dtype)(h, cond)
        mask = jax.nn.sigmoid(nn.Conv(self.channels, (1, 1),
                                      use_bias=self.use_bias,
                                      dtype=self.dtype)(h))
        feat = nn.Conv(self.channels, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype)(h)
        return feat * mask + x * (1 - mask)


class Generator(nn.Module):
    tags: Sequence[int] = (9, 10, 2)     # tags per category (hair/eye/glass)
    image_size: int = 128
    image_channels: int = 3
    style_dim: int = 256
    latent_dim: int = 128
    enc_num_downs: int = 2
    map_mid_dim: int = 256
    map_num_shared_layers: int = 3
    map_num_tag_layers: int = 3
    channels: int = 32
    ex_bottom_width: int = 8
    trans_num_blocks: int = 7
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    use_bias: bool = True
    normalize_latent: bool = False
    single_path: bool = False
    affine_each: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.encode = Encoder(self.channels, self.enc_num_downs,
                              self.norm_name, self.act_name, self.use_bias,
                              self.dtype)
        self.decode = Decoder(self.image_channels, self.enc_num_downs,
                              self.norm_name, self.act_name, self.use_bias,
                              self.dtype)
        mid = self.channels * 2 ** self.enc_num_downs
        self.mappers = [
            Mapper(t, self.style_dim, self.map_mid_dim,
                   self.map_num_shared_layers, self.map_num_tag_layers,
                   self.act_name, self.use_bias, self.normalize_latent,
                   self.single_path, name=f'map_{i}')
            for i, t in enumerate(self.tags)]
        self.extractors = [
            Extractor(t, self.style_dim, self.image_size, self.channels,
                      self.ex_bottom_width, self.norm_name, self.act_name,
                      self.use_bias, self.single_path, dtype=self.dtype,
                      name=f'extract_{i}')
            for i, t in enumerate(self.tags)]
        self.translators = [
            Translator(mid, self.style_dim, self.trans_num_blocks,
                       self.act_name, self.use_bias, self.affine_each,
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
    tail, [num_tag*2] output channels, (j, branch) selected traced (:432).
    `ret_feat`: also return the shared-trunk + tail hidden features for
    feature matching (:515).'''
    tags: Sequence[int] = (9, 10, 2)
    image_channels: int = 3
    num_layers: int = 3
    channels: int = 32
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    use_bias: bool = True
    ret_feat: bool = False
    single_path: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, i: int, j):
        if self.single_path:
            i, j = 0, jnp.int32(0)
        act = get_activation(self.act_name)
        c = self.channels
        x = nn.Conv(c, (4, 4), strides=(2, 2), use_bias=self.use_bias,
                    dtype=self.dtype)(x.astype(self.dtype))
        x = act(x)
        feats = [x]
        for _ in range(self.num_layers - 1):
            c *= 2
            x = nn.Conv(c, (4, 4), strides=(2, 2), use_bias=self.use_bias,
                        dtype=self.dtype)(x)
            x = get_normalization(self.norm_name, c, dtype=self.dtype)(x)
            x = act(x)
            feats.append(x)
        num_tag = 1 if self.single_path else self.tags[i]
        onehot = jax.nn.one_hot(j, num_tag)
        N, H, W, _ = x.shape
        cond = jnp.broadcast_to(onehot[None, None, None, :],
                                (N, H, W, num_tag)).astype(x.dtype)
        h = jnp.concatenate([x, cond], axis=-1)
        h = nn.Conv(c * 2, (4, 4), use_bias=self.use_bias, dtype=self.dtype,
                    name=f'tail_{i}_0')(h)
        h = get_normalization(self.norm_name, c * 2, dtype=self.dtype)(h)
        h = act(h)
        feats.append(h)
        out = nn.Conv(num_tag * 2, (4, 4), use_bias=self.use_bias,
                      dtype=self.dtype, name=f'tail_{i}_1')(h)
        out = out.astype(jnp.float32)
        # select tag j's (fake, cycle) channel pair
        out = out.reshape(out.shape[:3] + (num_tag, 2))
        out = jnp.take(out, j, axis=3)       # [N,h,w,2]
        if self.ret_feat:
            return out, feats
        return out
