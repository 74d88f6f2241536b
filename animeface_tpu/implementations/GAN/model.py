'''Vanilla MLP GAN (reference `implementations/GAN/model.py:6,33`), as Flax
NHWC modules. The BatchNorm epsilon of 0.8 replicates the reference's
`nn.BatchNorm1d(out_feat, 0.8)` (second positional arg is eps, not momentum).
'''

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


class Generator(nn.Module):
    latent_dim: int = 100
    image_shape: tuple = (64, 64, 3)   # HWC (reference used CHW)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = z.astype(self.dtype)
        for feat, normalize in ((128, False), (256, True), (512, True), (1024, True)):
            x = nn.Dense(feat, dtype=self.dtype)(x)
            if normalize:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=0.8, dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Dense(int(np.prod(self.image_shape)), dtype=self.dtype)(x)
        x = jnp.tanh(x)
        return x.reshape((x.shape[0],) + tuple(self.image_shape)).astype(jnp.float32)


class Discriminator(nn.Module):
    image_shape: tuple = (64, 64, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        x = nn.Dense(512, dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Dense(256, dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Dense(1, dtype=self.dtype)(x)
        return x.astype(jnp.float32)
