'''Auxiliary-classifier GAN (reference `implementations/ACGAN/model.py:16,50`).

G: label embedding multiplied into z (reference :41-43); D: shared conv trunk
with a validity head (4x4 valid conv) and a class head (global avg-pool +
dense).
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
        emb = nn.Embed(self.label_dim, self.latent_dim,
                       embedding_init=nn.initializers.normal(1.0))(label)
        x = (z * emb).reshape(z.shape[0], 1, 1, self.latent_dim).astype(self.dtype)
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
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        chans = list(reversed(_channel_ladder(self.image_size)))
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=_n002(), dtype=self.dtype)(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 scale_init=_bn_scale_init, dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        validity = nn.Conv(1, (4, 4), strides=(1, 1), padding='VALID',
                           use_bias=False, kernel_init=_n002(),
                           dtype=self.dtype)(x)
        pooled = jnp.mean(x, axis=(1, 2))
        label = nn.Dense(self.label_dim, dtype=self.dtype)(pooled)
        return (validity.reshape(x.shape[0], -1).astype(jnp.float32),
                label.astype(jnp.float32))
