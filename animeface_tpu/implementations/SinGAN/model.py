'''SinGAN (reference `implementations/SinGAN/model.py`): single-image
multi-scale pyramid GAN — per-scale 5-layer conv G with noise+previous-image
skip (SingleScaleGenerator :42), patch D, pyramid container (Generator :92,
plain python — not a module). Per-scale params are separate trees; the pyramid
forward for scale s traces generators 0..s with earlier scales frozen.'''

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding='VALID', dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return jax.nn.leaky_relu(x, 0.2)


class SingleScaleGenerator(nn.Module):
    channels: int = 32
    kernel_size: int = 3
    num_layers: int = 5
    img_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, noised_img, pre_img, train: bool = True):
        pad = ((self.kernel_size - 1) * self.num_layers) // 2
        x = jnp.pad(noised_img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        x = x.astype(self.dtype)
        for _ in range(self.num_layers - 1):
            x = ConvBlock(self.channels, self.kernel_size,
                          self.dtype)(x, train)
        x = nn.Conv(self.img_channels,
                    (self.kernel_size, self.kernel_size),
                    padding='VALID', dtype=self.dtype)(x)
        x = jnp.tanh(x.astype(jnp.float32))
        return x + pre_img


class SingleScaleDiscriminator(nn.Module):
    channels: int = 32
    kernel_size: int = 3
    num_layers: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        for _ in range(self.num_layers - 1):
            x = ConvBlock(self.channels, self.kernel_size,
                          self.dtype)(x, train)
        x = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding='VALID', dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def resize_img(img, size):
    return jax.image.resize(img, (img.shape[0], size, size, img.shape[-1]),
                            method='bilinear')


def pyramid_forward(gens, param_list, bs_list, sizes, noise_amps, keys,
                    up_to, rec_noise=None, train=True):
    '''Generate through scales 0..up_to. rec_noise given -> reconstruction
    mode (fixed noise at scale 0, zeros above, reference forward :117).'''
    image = None
    new_bs = list(bs_list)
    for s in range(up_to + 1):
        size = sizes[s]
        if s == 0:
            pre = jnp.zeros((1, size, size, 3))
            if rec_noise is not None:
                noise = rec_noise
            else:
                noise = jax.random.normal(keys[s], (1, size, size, 1))
            noise = jnp.broadcast_to(noise, (1, size, size, 3))
        else:
            pre = resize_img(image, size)
            if rec_noise is not None:
                noise = jnp.zeros((1, size, size, 3))
            else:
                noise = jax.random.normal(keys[s], (1, size, size, 3))
        noised = noise * noise_amps[s] + pre
        variables = {'params': param_list[s], 'batch_stats': bs_list[s]}
        if train and s == up_to:
            image, mut = gens[s].apply(variables, jax.lax.stop_gradient(noised),
                                       pre, train=True,
                                       mutable=['batch_stats'])
            new_bs[s] = mut['batch_stats']
        else:
            image = gens[s].apply(variables, jax.lax.stop_gradient(noised),
                                  pre, train=False)
    return image, new_bs
