'''ContraD (reference `implementations/ContraD/model.py`): SN-ResNet feature
extractor (:71), 3-head projector (adv / NT-Xent / SupCon, :114) where the
adversarial head sees stop-gradiented features during D training, and the
StyleGAN2 generator. SimCLR-style views live in utils.'''

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.StyleGAN2.model import Generator  # noqa: F401


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


class SNConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       strides=(self.strides, self.strides),
                       padding=self.kernel_size // 2, dtype=self.dtype)
        return nn.SpectralNorm(conv)(x, update_stats=train)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        h = SNConv(self.features, 3, self.strides, self.dtype)(x, train)
        h = _inorm(self.dtype)(h)
        h = jax.nn.leaky_relu(h, 0.2)
        h = SNConv(self.features, 3, 1, self.dtype)(h, train)
        h = _inorm(self.dtype)(h)
        if self.strides != 1 or in_ch != self.features:
            x = SNConv(self.features, 1, self.strides, self.dtype)(x, train)
        return jax.nn.leaky_relu(h + x, 0.2)


class ResNet(nn.Module):
    blocks: Sequence[int] = (2, 2, 2, 2)
    channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = SNConv(self.channels, 3, 1, self.dtype)(
            x.astype(self.dtype), train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i, n in enumerate(self.blocks):
            stride = 1 if i == 0 else 2
            ch = self.channels * 2 ** i
            for j in range(n):
                x = BasicBlock(ch, stride if j == 0 else 1,
                               self.dtype)(x, train)
        return jnp.mean(x, axis=(1, 2))


class Projector(nn.Module):
    projection_features: int = 128
    hidden_features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, stop_grad: bool, train: bool = True):
        def mlp(out, name):
            def run(h):
                h = nn.SpectralNorm(nn.Dense(
                    self.hidden_features, dtype=self.dtype),
                    name=f'{name}_0')(h, update_stats=train)
                h = jax.nn.leaky_relu(h, 0.2)
                h = nn.SpectralNorm(nn.Dense(out, dtype=self.dtype),
                                    name=f'{name}_1')(h, update_stats=train)
                return h
            return run

        x_adv = jax.lax.stop_gradient(x) if stop_grad else x
        adv = mlp(1, 'adv')(x_adv)
        con = mlp(self.projection_features, 'con')(x)
        supcon = mlp(self.projection_features, 'supcon')(x)
        return (adv.astype(jnp.float32), con.astype(jnp.float32),
                supcon.astype(jnp.float32))


class Discriminator(nn.Module):
    blocks: Sequence[int] = (2, 2, 2, 2)
    channels: int = 64
    projection_features: int = 128
    hidden_features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, stop_grad: bool = False, train: bool = True):
        feat = ResNet(self.blocks, self.channels, self.dtype)(x, train)
        return Projector(self.projection_features, self.hidden_features,
                         self.dtype)(feat, stop_grad, train)
