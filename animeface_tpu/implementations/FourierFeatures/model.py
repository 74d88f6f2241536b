'''Fourier-feature coordinate MLP (reference `implementations/FourierFeatures/
model.py`: GaussianFourierFeatureMapping :17, MLP :33): regress an image from
pixel coordinates, with optional Gaussian random feature mapping.

The reference's 1x1 convs over a [1, C, H, W] coordinate grid are Dense layers
over flattened [H*W, C] pixels here (identical math, MXU-shaped); its
`BatchNorm2d` reduces over (N, H, W) which is exactly the pixel axis of the
flattened layout (`PixelNorm` below; stateless — the recipe always evaluates
on the same coordinate distribution it trains on).
'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation


class PixelBatchNorm(nn.Module):
    '''Affine batch norm over the pixel axis of [P, C] (reference
    model.py:11 `get_normalization('bn')`).'''
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (x.shape[-1],))
        bias = self.param('bias', nn.initializers.zeros, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=0, keepdims=True)
        var = jnp.var(x32, axis=0, keepdims=True)
        out = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return out.astype(self.dtype)


class GaussianFourierFeatureMapping(nn.Module):
    '''[cos(2*pi*xB), sin(2*pi*xB)] random features (reference model.py:17).'''
    map_size: int = 256
    scale: float = 10.0

    @nn.compact
    def __call__(self, x):
        B = self.variable(
            'consts', 'B',
            lambda: jax.random.normal(self.make_rng('params'),
                                      (x.shape[-1], self.map_size // 2))
            * self.scale)
        proj = 2 * np.pi * x @ B.value
        return jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)


class MLP(nn.Module):
    '''Reference model.py:33 — `num_layers` 1x1 convs total, pre-activation
    norm->act before every conv after the first.'''
    use_map: bool = True
    map_size: int = 256
    map_scale: float = 10.0
    num_layers: int = 4
    hid_channels: int = 256
    act_name: str = 'relu'
    norm_name: str | None = 'bn'
    out_channels: int = 3
    dtype: Any = jnp.float32

    def _norm(self, x):
        if self.norm_name == 'bn':
            return PixelBatchNorm(self.dtype)(x)
        return x   # reference: None -> Identity

    @nn.compact
    def __call__(self, coords):
        x = coords
        if self.use_map:
            x = GaussianFourierFeatureMapping(self.map_size, self.map_scale)(x)
        x = nn.Dense(self.hid_channels, dtype=self.dtype)(x.astype(self.dtype))
        for _ in range(self.num_layers - 2):
            x = self._norm(x)
            x = get_activation(self.act_name)(x)
            x = nn.Dense(self.hid_channels, dtype=self.dtype)(x)
        x = self._norm(x)
        x = get_activation(self.act_name)(x)
        x = nn.Dense(self.out_channels, dtype=self.dtype)(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))


def make_coords(h: int, w: int):
    '''[h, w, 2] normalized pixel-center coordinates in [0, 1].'''
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
    return jnp.stack([gx, gy], axis=-1)
