'''VAE (reference `implementations/VAE/model.py:103`): conv encoder to
(mu, logvar), reparameterized sample, conv decoder.

TPU deltas (architecture only; every reference knob is exposed):
* the reference's first decoder layer `ConvTranspose2d(z_dim, C, 4, 2, 0)`
  on a 1x1 input is exactly a dense map z -> [4, 4, C] (each output pixel is
  an independent linear function of z), implemented as `nn.Dense` + reshape;
* the remaining `ConvTranspose2d(3, 2, 1, output_padding=1)` upsamplers are
  nearest-resize + 3x3 conv — the MXU-friendly equivalent (XLA lowers
  strided transposed convs to scatter-like ops; resize+conv keeps the
  whole decode on dense convs).
'''

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation, get_normalization


class ConvBlock(nn.Module):
    '''3x3 stride-2 conv -> norm -> act (reference model.py:15).'''
    features: int
    use_bias: bool = True
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        x = get_normalization(self.norm_name, self.features,
                              dtype=self.dtype)(x)
        return get_activation(self.act_name)(x)


class UpBlock(nn.Module):
    '''2x nearest resize + 3x3 conv -> norm -> act (reference model.py:25,
    `ConvTransposeBlock`; see module docstring for the TPU delta).'''
    features: int
    use_bias: bool = True
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
        x = nn.Conv(self.features, (3, 3), padding=1,
                    use_bias=self.use_bias, dtype=self.dtype)(x)
        x = get_normalization(self.norm_name, self.features,
                              dtype=self.dtype)(x)
        return get_activation(self.act_name)(x)


class Encoder(nn.Module):
    '''Strided conv stack to `target_resl`, flatten, mu/var heads
    (reference model.py:35).'''
    image_size: int = 128
    z_dim: int = 256
    in_channels: int = 3
    target_resl: int = 4
    channels: int = 32
    max_channels: int = 1024
    use_bias: bool = True
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = ConvBlock(c, self.use_bias, self.norm_name, self.act_name,
                      self.dtype)(x.astype(self.dtype))
        size = self.image_size // 2
        while size > self.target_resl:
            size //= 2
            c *= 2
            x = ConvBlock(min(self.max_channels, c), self.use_bias,
                          self.norm_name, self.act_name, self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        mu = nn.Dense(self.z_dim, use_bias=self.use_bias,
                      dtype=jnp.float32)(x.astype(jnp.float32))
        logvar = nn.Dense(self.z_dim, use_bias=self.use_bias,
                          dtype=jnp.float32)(x.astype(jnp.float32))
        return mu, logvar


class Decoder(nn.Module):
    '''Dense z->4x4, resize-conv upsample ladder, 3x3 + tanh head
    (reference model.py:71).'''
    image_size: int = 128
    z_dim: int = 256
    out_channels: int = 3
    channels: int = 32
    max_channels: int = 1024
    use_bias: bool = True
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        # reference: num_layers = log2(image_size) - 2, ladder halves from
        # channels * 2**num_layers (model.py:81-92); first layer lands at 4x4
        num_layers = int(math.log2(self.image_size)) - 2
        c = self.channels * 2 ** num_layers
        och = min(self.max_channels, c)
        x = nn.Dense(och * 16, use_bias=self.use_bias,
                     dtype=self.dtype)(z.astype(self.dtype))
        x = x.reshape(-1, 4, 4, och)
        x = get_normalization(self.norm_name, och, dtype=self.dtype)(x)
        x = get_activation(self.act_name)(x)
        for _ in range(num_layers):
            c //= 2
            och = min(self.max_channels, c)
            x = UpBlock(och, self.use_bias, self.norm_name, self.act_name,
                        self.dtype)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    use_bias=self.use_bias, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class VAE(nn.Module):
    '''Reference model.py:103 — encoder/decoder pair + reparameterization.'''
    image_size: int = 128
    z_dim: int = 256
    image_channels: int = 3
    channels: int = 32
    max_channels: int = 1024
    enc_target_resl: int = 4
    use_bias: bool = True
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.image_size, self.z_dim,
                               self.image_channels, self.enc_target_resl,
                               self.channels, self.max_channels,
                               self.use_bias, self.norm_name, self.act_name,
                               self.dtype)
        self.decoder = Decoder(self.image_size, self.z_dim,
                               self.image_channels, self.channels,
                               self.max_channels, self.use_bias,
                               self.norm_name, self.act_name, self.dtype)

    def reparameterize(self, key, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(key, mu.shape)
        return eps * std + mu

    def __call__(self, x, key=None):
        mu, logvar = self.encoder(x)
        if key is None:
            key = self.make_rng('reparam')
        z = self.reparameterize(key, mu, logvar)
        recons = self.decoder(z)
        return recons, z, mu, logvar

    def decode(self, z):
        return self.decoder(z)
