'''Fourier-feature coordinate MLP (reference `implementations/FourierFeatures/
model.py`: GaussianFourierFeatureMapping :17, MLP :33): regress an image from
pixel coordinates, with optional Gaussian random feature mapping.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


class GaussianFourierFeatureMapping(nn.Module):
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
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class MLP(nn.Module):
    use_map: bool = True
    map_size: int = 256
    map_scale: float = 10.0
    num_layers: int = 4
    channels: int = 256
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords):
        x = coords
        if self.use_map:
            x = GaussianFourierFeatureMapping(self.map_size, self.map_scale)(x)
        for _ in range(self.num_layers):
            x = nn.Dense(self.channels, dtype=self.dtype)(x)
            x = jax.nn.relu(x)
        x = nn.Dense(self.out_channels, dtype=self.dtype)(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))


def make_coords(h: int, w: int):
    '''[h, w, 2] normalized pixel-center coordinates in [0, 1].'''
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
    return jnp.stack([gx, gy], axis=-1)
