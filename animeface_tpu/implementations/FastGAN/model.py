'''FastGAN (reference `implementations/FastGAN/model.py`): skip-layer
excitation generator + self-supervised discriminator with reconstruction
decoders. Flax NHWC; spectral norm via nn.SpectralNorm (power-iteration
state in the 'batch_stats' collection alongside BatchNorm stats); GLU over
the channel axis; the random part-crop for the D decoder is a traced
`lax.switch` over the four quadrants (reference model.py:260-277 branches
host-side per step).

Knobs match the reference signatures: `norm_name` ('bn'|'in'; conv bias is
enabled iff norm != 'bn', reference model.py:26,80,163,198), `transposed`
(ConvTranspose2d up-path instead of Upsample+Conv), `num_sle`.
'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class SNConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = 'SAME'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.SpectralNorm(nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides), padding=self.padding,
            use_bias=self.use_bias, dtype=self.dtype))
        return conv(x, update_stats=train)


class SNConvT(nn.Module):
    '''Spectral-normalized ConvTranspose (reference ConvTranspose2d :17).'''
    features: int
    kernel_size: int = 4
    strides: int = 2
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.SpectralNorm(nn.ConvTranspose(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides), padding=self.padding,
            use_bias=self.use_bias, dtype=self.dtype))
        return conv(x, update_stats=train)


class SNDense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dense = nn.SpectralNorm(nn.Dense(self.features, use_bias=self.use_bias,
                                         dtype=self.dtype))
        return dense(x, update_stats=train)


def glu(x):
    return nn.glu(x, axis=-1)


def up2x(x):
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')


class Norm(nn.Module):
    ''''bn' -> BatchNorm, 'in' -> affine-free instance norm (reference
    get_normalization, model.py:12).'''
    norm_name: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.norm_name == 'bn':
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=self.dtype)(x)
        return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, dtype=self.dtype)(x)


class UpBlock(nn.Module):
    '''upsample2x -> SNConv(out*2) -> norm -> GLU, or the transposed-conv
    variant (reference UpBlock :19).'''
    features: int
    transposed: bool = False
    norm_name: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bias = self.norm_name != 'bn'
        if self.transposed:
            x = SNConvT(self.features * 2, 4, 2, ((1, 1), (1, 1)),
                        use_bias=bias, dtype=self.dtype)(x, train)
        else:
            x = up2x(x)
            x = SNConv(self.features * 2, 3, use_bias=bias,
                       dtype=self.dtype)(x, train)
        x = Norm(self.norm_name, self.dtype)(x, train)
        return glu(x)


class SkipLayerExcitation(nn.Module):
    '''Gate high-res features by a global squeeze of low-res ones (:47).'''
    features: int          # channels of the high-res path
    interp_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, high, low, train: bool = True):
        N, H, W, C = low.shape
        s = self.interp_size
        pooled = nn.avg_pool(low, (H // s, W // s), strides=(H // s, W // s))
        y = SNConv(C, s, padding='VALID', dtype=self.dtype)(pooled, train)
        y = jax.nn.leaky_relu(y, 0.2)
        y = SNConv(self.features, 1, dtype=self.dtype)(y, train)
        return high * jax.nn.sigmoid(y)


class Generator(nn.Module):
    '''SLE generator (:70).'''
    latent_dim: int = 128
    image_size: int = 256
    channels: int = 32
    max_channels: int = 512
    interp_size: int = 4
    image_channels: int = 3
    bottom: int = 4
    norm_name: str = 'bn'
    transposed: bool = False
    num_sle: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        num_ups = int(math.log2(self.image_size) - math.log2(self.bottom))
        channels = self.channels * 2 ** num_ups
        och = min(self.max_channels, channels)
        bias = self.norm_name != 'bn'

        if self.transposed:
            # reference input (:83): ConvTranspose2d(latent, och*2, 4, 2)
            # on a 1x1 map -> 4x4
            x = z.astype(self.dtype).reshape(-1, 1, 1, z.shape[-1])
            x = SNConvT(och * 2, 4, 2, 'VALID', use_bias=bias,
                        dtype=self.dtype)(x, train)
        else:
            x = SNDense(och * 2 * self.bottom ** 2, use_bias=bias,
                        dtype=self.dtype)(z.astype(self.dtype), train)
            x = x.reshape(-1, self.bottom, self.bottom, och * 2)
        x = Norm(self.norm_name, self.dtype)(x, train)
        x = glu(x)

        ladder = []
        c = channels
        for _ in range(num_ups):
            c //= 2
            ladder.append(min(self.max_channels, c))

        num_sle = self.num_sle
        if num_sle is None:
            num_sle = len(ladder[:-1]) // 2
        collect = list(range(num_sle))
        apply_at = [len(ladder) + i - num_sle - 1 for i in range(num_sle)]
        sle_targets = {apply_at[i]: i for i in range(num_sle)}

        feats = []
        for i, ch in enumerate(ladder):
            x = UpBlock(ch, self.transposed, self.norm_name,
                        dtype=self.dtype)(x, train)
            if i in collect:
                feats.append(x)
            if i in sle_targets:
                j = sle_targets[i]
                x = SkipLayerExcitation(ch, self.interp_size,
                                        dtype=self.dtype)(x, feats[j], train)
        x = SNConv(self.image_channels, 3, use_bias=True,
                   dtype=self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


class ResBlock(nn.Module):
    '''Strided-conv residual down block (:135).'''
    features: int
    norm_name: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bias = self.norm_name != 'bn'
        h = SNConv(self.features, 4, strides=2, padding=((1, 1), (1, 1)),
                   use_bias=bias, dtype=self.dtype)(x, train)
        h = Norm(self.norm_name, self.dtype)(h, train)
        h = jax.nn.leaky_relu(h, 0.2)
        h = SNConv(self.features, 3, use_bias=bias, dtype=self.dtype)(h, train)
        h = Norm(self.norm_name, self.dtype)(h, train)
        h = jax.nn.leaky_relu(h, 0.2)
        t = nn.avg_pool(x, (2, 2), strides=(2, 2))
        t = SNConv(self.features, 1, use_bias=bias, dtype=self.dtype)(t, train)
        t = jax.nn.leaky_relu(t, 0.2)
        return h + t


class SimpleDecoder(nn.Module):
    '''8x8 feature -> decoder_image_size image (:157).'''
    image_size: int = 128
    image_channels: int = 3
    bottom: int = 8
    transposed: bool = False
    norm_name: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_ups = int(math.log2(self.image_size) - math.log2(self.bottom))
        c = x.shape[-1]
        for _ in range(num_ups):
            c //= 2
            x = UpBlock(c, self.transposed, self.norm_name,
                        dtype=self.dtype)(x, train)
        x = SNConv(self.image_channels, 3, use_bias=True,
                   dtype=self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


def _quadrant(feat, qid):
    '''Traced quadrant select of an [N,16,16,C] feature -> [N,8,8,C].'''
    h = feat.shape[1] // 2
    return jax.lax.switch(qid, [
        lambda f: f[:, :h, :h], lambda f: f[:, h:, :h],
        lambda f: f[:, :h, h:], lambda f: f[:, h:, h:]], feat)


class Discriminator(nn.Module):
    '''Self-supervised D: logits + full/part reconstruction losses (:190).'''
    image_size: int = 256
    init_down_size: int = 256
    image_channels: int = 3
    channels: int = 32
    max_channels: int = 1024
    norm_name: str = 'bn'
    bottom: int = 8
    decoder_image_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, part_key=None, train: bool = True,
                 return_recon: bool = True):
        org = x
        init_downs = int(math.log2(self.image_size)
                         - math.log2(self.init_down_size))
        num_downs = int(math.log2(self.init_down_size) - math.log2(self.bottom))
        bias = self.norm_name != 'bn'

        c = self.channels
        if init_downs == 0:
            x = SNConv(c, 3, use_bias=bias, dtype=self.dtype)(
                x.astype(self.dtype), train)
            x = jax.nn.leaky_relu(x, 0.2)
        else:
            x = SNConv(c, 4, strides=2, padding=((1, 1), (1, 1)),
                       use_bias=bias, dtype=self.dtype)(
                x.astype(self.dtype), train)
            x = jax.nn.leaky_relu(x, 0.2)
            for _ in range(init_downs - 1):
                c *= 2
                och = min(self.max_channels, c)
                x = SNConv(och, 4, strides=2, padding=((1, 1), (1, 1)),
                           use_bias=bias, dtype=self.dtype)(x, train)
                x = Norm(self.norm_name, self.dtype)(x, train)
                x = jax.nn.leaky_relu(x, 0.2)

        feats = {}
        resl = self.init_down_size
        och = c
        for _ in range(num_downs):
            resl //= 2
            c *= 2
            och = min(self.max_channels, c)
            x = ResBlock(och, self.norm_name, dtype=self.dtype)(x, train)
            if resl in (16, 8):
                feats[resl] = x

        logits = SNConv(och * 2, 1, use_bias=bias, dtype=self.dtype)(x, train)
        logits = Norm(self.norm_name, self.dtype)(logits, train)
        logits = jax.nn.leaky_relu(logits, 0.2)
        logits = SNConv(1, 4, padding='VALID', use_bias=True,
                        dtype=self.dtype)(logits, train)
        logits = logits.reshape(logits.shape[0], -1).astype(jnp.float32)

        # ---- self-supervised reconstructions ----
        N = org.shape[0]
        small = jax.image.resize(
            org, (N, self.decoder_image_size, self.decoder_image_size,
                  self.image_channels), method='nearest')
        recon = SimpleDecoder(self.decoder_image_size, self.image_channels,
                              norm_name=self.norm_name, dtype=self.dtype,
                              name='decoder_8')(feats[8], train)
        recon_full_loss = jnp.mean((recon - small) ** 2)

        if part_key is None:
            part_key = self.make_rng('part')
        qid = jax.random.randint(part_key, (), 0, 4)
        part_feat = _quadrant(feats[16], qid)
        img_part = _quadrant(org, qid)
        img_part = jax.image.resize(
            img_part, (N, self.decoder_image_size, self.decoder_image_size,
                       self.image_channels), method='nearest')
        recon_part = SimpleDecoder(self.decoder_image_size, self.image_channels,
                                   norm_name=self.norm_name, dtype=self.dtype,
                                   name='decoder_16')(part_feat, train)
        recon_part_loss = jnp.mean((recon_part - img_part) ** 2)

        recon_loss = recon_full_loss + recon_part_loss
        if return_recon:
            return logits, recon_loss, [recon, small, recon_part, img_part]
        return logits, recon_loss
