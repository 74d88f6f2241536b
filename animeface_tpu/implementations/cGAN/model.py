'''Conditional GAN on one-hot labels (reference `implementations/cGAN/model.py:16,47`).

DCGAN backbone conditioned by concatenation: G gets z‖onehot at the input,
D gets the one-hot broadcast as extra channels over the full image plane.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.DCGAN.model import (
    _channel_ladder, _n002, _bn_scale_init,
)


class Generator(nn.Module):
    latent_dim: int = 100
    label_dim: int = 10
    image_size: int = 128
    channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, label, train: bool = True):
        x = jnp.concatenate([z, label], axis=1)
        x = x.reshape(x.shape[0], 1, 1, x.shape[-1]).astype(self.dtype)
        chans = _channel_ladder(self.image_size)
        x = nn.ConvTranspose(chans[0], (4, 4), strides=(1, 1), padding='VALID',
                             use_bias=False, kernel_init=_n002(),
                             dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         scale_init=_bn_scale_init, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        for ch in chans[1:]:
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding='SAME',
                                 use_bias=False, kernel_init=_n002(),
                                 dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             scale_init=_bn_scale_init, dtype=self.dtype)(x)
            x = jax.nn.relu(x)
        x = nn.ConvTranspose(self.channels, (4, 4), strides=(2, 2),
                             padding='SAME', use_bias=False,
                             kernel_init=_n002(), dtype=self.dtype)(x)
        return jnp.tanh(x).astype(jnp.float32)


class Discriminator(nn.Module):
    label_dim: int = 10
    image_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, label, train: bool = True):
        N, H, W, _ = x.shape
        lab = jnp.broadcast_to(label[:, None, None, :], (N, H, W, label.shape[-1]))
        x = jnp.concatenate([x, lab], axis=-1).astype(self.dtype)
        chans = list(reversed(_channel_ladder(self.image_size)))
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=_n002(), dtype=self.dtype)(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 scale_init=_bn_scale_init, dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding='VALID',
                    use_bias=False, kernel_init=_n002(), dtype=self.dtype)(x)
        return x.reshape(N, -1).astype(jnp.float32)
