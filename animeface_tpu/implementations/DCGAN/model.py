'''DCGAN (reference `implementations/DCGAN/model.py:16,46`), Flax NHWC.

The reference is fixed to 128px (1x1 -> 4x4 -> five x2 stages); this version
derives the stage count from `image_size` and reproduces the reference channel
ladder (1024/512/256/128/64) at 128px. Weight init N(0, 0.02) on convs and
N(1, 0.02) on BatchNorm scales matches `weights_init_normal` (model.py:7).
'''

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _n002():
    return nn.initializers.normal(stddev=0.02)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


def _channel_ladder(image_size: int, base: int = 64, cap: int = 1024):
    n_up = int(np.log2(image_size // 4))
    chans = [min(cap, base * 2 ** (n_up - 1 - i)) for i in range(n_up)]
    return chans  # e.g. 128px -> [1024, 512, 256, 128, 64]


class Generator(nn.Module):
    latent_dim: int = 100
    image_size: int = 128
    channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        chans = _channel_ladder(self.image_size)
        x = z.reshape(z.shape[0], 1, 1, z.shape[-1]).astype(self.dtype)
        # 1x1 -> 4x4
        x = nn.ConvTranspose(chans[0], (4, 4), strides=(1, 1), padding='VALID',
                             use_bias=False, kernel_init=_n002(),
                             dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         scale_init=_bn_scale_init, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        # x2 stages
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
    image_size: int = 128
    channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        chans = list(reversed(_channel_ladder(self.image_size)))
        x = x.astype(self.dtype)
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=_n002(), dtype=self.dtype)(x)
            if i > 0:  # reference: no BN on the first conv
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 scale_init=_bn_scale_init, dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        # 4x4 -> 1x1 logit
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding='VALID',
                    use_bias=False, kernel_init=_n002(), dtype=self.dtype)(x)
        return x.reshape(x.shape[0], -1).astype(jnp.float32)
