'''SinGAN (reference `implementations/SinGAN/model.py`): single-image
multi-scale pyramid GAN — per-scale conv G with noise+previous-image skip
(SingleScaleGenerator :42), patch D (:70), pyramid containers (Generator
:92 / Discriminator :184, plain python — not modules). Per-scale params are
separate trees; the pyramid forward for scale s traces generators 0..s with
earlier scales frozen.

Reference quirks reproduced exactly:
  * channel doubling every 4 scales is OFFSET by one between G and D — G
    doubles starting at generator index 4 (model.py:111-113), D starting at
    discriminator index 3 (:197-199);
  * noise is sampled at HALF resolution and bilinearly upsampled
    (gnoise, :137-140) — smooth noise, not white (jax.image bilinear vs
    torch align_corners=True: interior weights differ by O(1/size));
  * new scales warm-start from the previous scale's params unless the
    channel width just doubled (progress, :153-157);
  * norm_layer in {'bn','in','sn'} (ConvBlock :17-24), conv init
    normal(0, 0.02), bn scale normal(1, 0.02) (:30-34).
'''

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module.layers import get_normalization

_conv_init = nn.initializers.normal(0.02)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class ConvBlock(nn.Module):
    '''conv -> {bn|in|sn} -> lrelu(0.2) (reference ConvBlock, model.py:6).'''
    features: int
    kernel_size: int = 3
    norm_layer: str = 'bn'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.Conv(self.features,
                       (self.kernel_size, self.kernel_size),
                       padding='VALID', use_bias=self.use_bias,
                       kernel_init=_conv_init, dtype=self.dtype)
        if self.norm_layer == 'sn':
            x = nn.SpectralNorm(conv)(x, update_stats=train)
        else:
            x = conv(x)
            if self.norm_layer == 'bn':
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 scale_init=_bn_scale_init,
                                 dtype=self.dtype)(x)
            elif self.norm_layer == 'in':
                x = get_normalization('in', self.features,
                                      dtype=self.dtype)(x)
        return jax.nn.leaky_relu(x, 0.2)


class SingleScaleGenerator(nn.Module):
    '''Reference SingleScaleGenerator (model.py:42): pad, num_layers-1
    ConvBlocks + plain output conv (+ optional Tanh), skip-add pre_img.'''
    channels: int = 32
    kernel_size: int = 3
    norm_layer: str = 'bn'
    num_layers: int = 5
    img_channels: int = 3
    img_out: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, noised_img, pre_img, train: bool = True):
        pad = ((self.kernel_size - 1) * self.num_layers) // 2
        x = jnp.pad(noised_img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        x = x.astype(self.dtype)
        for _ in range(self.num_layers - 1):
            x = ConvBlock(self.channels, self.kernel_size, self.norm_layer,
                          self.use_bias, self.dtype)(x, train)
        x = nn.Conv(self.img_channels,
                    (self.kernel_size, self.kernel_size),
                    padding='VALID', use_bias=self.use_bias,
                    kernel_init=_conv_init, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        if self.img_out:
            x = jnp.tanh(x)
        return x + pre_img


class SingleScaleDiscriminator(nn.Module):
    '''Reference SingleScaleDiscriminator (model.py:70): patch logits.'''
    channels: int = 32
    kernel_size: int = 3
    norm_layer: str = 'bn'
    num_layers: int = 5
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        for _ in range(self.num_layers - 1):
            x = ConvBlock(self.channels, self.kernel_size, self.norm_layer,
                          self.use_bias, self.dtype)(x, train)
        x = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding='VALID', use_bias=self.use_bias,
                    kernel_init=_conv_init, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def scale_channels(base: int, num_scale: int):
    '''-> (g_channels, d_channels) per scale, reproducing the reference's
    off-by-one doubling (G: model.py:111-113, D: :197-199).'''
    g, d = [], []
    ch = base
    for scale in range(1, num_scale + 1):
        g.append(ch)
        if scale % 4 == 0:
            ch *= 2
    ch = base
    for scale in range(1, num_scale + 1):
        if scale % 4 == 0:
            ch *= 2
        d.append(ch)
    return g, d


def resize_img(img, size):
    '''Bilinear resize to (h, w) (reference upsample, model.py:142-144).'''
    h, w = size
    return jax.image.resize(img, (img.shape[0], h, w, img.shape[-1]),
                            method='bilinear')


def gnoise(key, size, channels=1):
    '''Half-resolution gaussian noise bilinearly upsampled to `size`
    (reference gnoise, model.py:137-140).'''
    h, w = size
    noise = jax.random.normal(key, (1, h // 2, w // 2, channels))
    return resize_img(noise, size)


def pyramid_forward(gens, param_list, bs_list, sizes, noise_amps, keys,
                    up_to, rec_noise=None, train=True):
    '''Generate through scales 0..up_to (reference Generator.forward,
    model.py:117-135). rec_noise given -> reconstruction mode (fixed noise
    at scale 0, zeros above). Both the noise AND the upsampled pre image are
    detached in the noised input; gradient reaches scale `up_to` only
    through the skip arg (reference :133 `G(noise.detach(), pre)`).'''
    image = None
    new_bs = list(bs_list)
    for s in range(up_to + 1):
        size = sizes[s]
        if s == 0:
            pre = jnp.zeros((1, *size, 3))
            noise = rec_noise if rec_noise is not None else gnoise(keys[s], size)
            noise = jnp.broadcast_to(noise, (1, *size, 3))
        else:
            pre = resize_img(image, size)
            if rec_noise is not None:
                noise = jnp.zeros((1, *size, 3))
            else:
                noise = gnoise(keys[s], size, channels=3)
        noised = jax.lax.stop_gradient(noise * noise_amps[s] + pre)
        variables = {'params': param_list[s], **bs_list[s]}
        if train and s == up_to:
            image, mut = gens[s].apply(variables, noised, pre, train=True,
                                       mutable=['batch_stats'])
            new_bs[s] = mut
        else:
            image = gens[s].apply(variables, noised, pre, train=False)
    return image, new_bs
