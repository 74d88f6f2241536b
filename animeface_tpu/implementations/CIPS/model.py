'''CIPS — conditionally-independent pixel synthesis (reference
`implementations/CIPS/model.py`: ModulatedFC :30, StyleLayer :65,
FourierFeatureInput :126, Synthesis :184). Every pixel is produced by a
style-modulated MLP over (Fourier features + learned per-pixel constants) —
a [B, S², C] batched matmul stack, directly MXU-shaped. The discriminator is
the StyleGAN3-style binomial-filtered residual D (reference reuses it too).'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.ops import bias_act
from animeface_tpu.implementations.StyleGAN3.model import (
    Linear, Discriminator,  # noqa: F401 (D re-exported for the recipe)
)


class ModulatedFC(nn.Module):
    '''out[b] = x[b] @ (W * s[b] * scale / demod) (reference :30).'''
    features: int
    demod: bool = True
    gain: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        in_features = x.shape[-1]
        s = Linear(in_features, True, bias_init=1.0,
                   name='affine')(style.astype(jnp.float32))
        weight = self.param('weight', nn.initializers.normal(1.0),
                            (in_features, self.features))
        scale = self.gain / np.sqrt(in_features)
        w = (weight * scale)[None] * s[:, :, None]         # [B, in, out]
        if self.demod:
            d = jax.lax.rsqrt(jnp.sum(w * w, axis=1, keepdims=True) + 1e-8)
            w = w * d
        return jnp.einsum('bni,bio->bno', x.astype(self.dtype),
                          w.astype(self.dtype))


class StyleLayer(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        x = ModulatedFC(self.features, True, dtype=self.dtype)(x, style)
        b = self.param('bias', nn.initializers.zeros_init(), (self.features,))
        return bias_act(x, b.astype(x.dtype), act='lrelu')


class SynthesisInput(nn.Module):
    '''sin(coords @ B) Fourier features ‖ learned constants (reference :156).'''
    channels: int
    size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: int):
        S = self.size
        ys = (2 * jnp.arange(S) + 1) / S - 1
        xs = (2 * jnp.arange(S) + 1) / S - 1
        gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
        coords = jnp.stack([gx, gy], axis=-1).reshape(1, S * S, 2)
        ff = Linear(self.channels, use_bias=False, name='b')(coords)
        ff = jnp.sin(ff)
        const = self.param('constant', nn.initializers.normal(1.0),
                           (1, S * S, self.channels))
        ff = jnp.broadcast_to(ff, (batch, S * S, self.channels))
        const = jnp.broadcast_to(const, (batch, S * S, self.channels))
        return jnp.concatenate([ff, const], axis=-1).astype(self.dtype)


class Generator(nn.Module):
    image_size: int = 128
    latent_dim: int = 512
    style_dim: int = 512
    num_layers: int = 14
    channels: int = 32
    max_channels: int = 512
    image_channels: int = 3
    map_num_layers: int = 4
    pixel_norm: bool = True
    ema_decay: float = 0.998
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, truncation_psi: float = 1.0, train: bool = False):
        assert self.num_layers % 2 == 0
        # mapping with w_avg EMA
        x = z.astype(jnp.float32)
        if self.pixel_norm:
            x = x / (jnp.sqrt(jnp.mean(x * x, axis=1, keepdims=True)) + 1e-8)
        for _ in range(self.map_num_layers):
            x = Linear(self.style_dim, True, 'lrelu')(x)
        w_avg = self.variable('moments', 'w_avg',
                              lambda: jnp.zeros((self.style_dim,)))
        if train and not self.is_initializing():
            stats = jnp.mean(jax.lax.stop_gradient(x), axis=0)
            w_avg.value = stats * (1 - self.ema_decay) \
                + w_avg.value * self.ema_decay
        if truncation_psi != 1:
            x = w_avg.value[None] + (x - w_avg.value[None]) * truncation_psi
        w = x

        B = z.shape[0]
        S = self.image_size
        c = self.channels * 2 ** self.num_layers
        och = min(self.max_channels, c)
        h = SynthesisInput(och, S, self.dtype)(B)
        h = StyleLayer(och, self.dtype)(h, w)

        image = jnp.zeros((B, S * S, self.image_channels), jnp.float32)
        for i in range(self.num_layers // 2):
            c //= 2
            och = min(self.max_channels, c)
            h = StyleLayer(och, self.dtype)(h, w)
            h = StyleLayer(och, self.dtype)(h, w)
            rgb = ModulatedFC(self.image_channels, False,
                              dtype=self.dtype)(h, w)
            image = image + rgb.astype(jnp.float32)
        return image.reshape(B, S, S, self.image_channels)
