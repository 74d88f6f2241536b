'''ContraD (reference `implementations/ContraD/model.py`): the StyleGAN2
discriminator trunk cut before its final act+linear as the feature extractor
(reference utils.py:285-295) + a 3-head ELR projector (adv / NT-Xent /
SupCon, model.py:114) where the adversarial head sees stop-gradiented
features during D training; generator is StyleGAN2's. The reference also
ships an SN-ResNet extractor marked "not used" (model.py:71) — kept here for
inventory parity. SimCLR-style views live in utils.

Reference quirk: ContraD's local get_activation uses LeakyReLU(0.1)
(model.py:9), not the 0.2 used elsewhere — the projector reproduces that.'''

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.StyleGAN2.model import (  # noqa: F401
    Generator, Discriminator as _SG2Discriminator, ELRDense,
)


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
        h = _inorm(self.dtype)(x)
        h = jax.nn.leaky_relu(h, 0.1)
        h = SNConv(self.features, 3, self.strides, self.dtype)(h, train)
        h = _inorm(self.dtype)(h)
        h = jax.nn.leaky_relu(h, 0.1)
        h = SNConv(self.features, 3, 1, self.dtype)(h, train)
        if self.strides != 1 or in_ch != self.features:
            x = SNConv(self.features, 1, self.strides, self.dtype)(x, train)
        return (h + x) / jnp.sqrt(2.0).astype(h.dtype)


class ResNet(nn.Module):
    '''SN-ResNet extractor — present but unused in the reference (:71).'''
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
    '''Three ELR MLP heads (reference Projector, model.py:114): adv(1),
    project_con, project_supcon; adv input optionally stop-gradiented.'''
    projection_features: int = 256
    hidden_features: int = 256
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, stop_grad: bool):
        def act(h):
            if self.act_name == 'lrelu':
                return jax.nn.leaky_relu(h, 0.1)
            if self.act_name == 'relu':
                return jax.nn.relu(h)
            raise Exception(f'activation: {self.act_name}')

        def mlp(h, out, name):
            h = ELRDense(self.hidden_features, dtype=self.dtype,
                         name=f'{name}_0')(h)
            h = act(h)
            return ELRDense(out, dtype=self.dtype, name=f'{name}_1')(h)

        x_adv = jax.lax.stop_gradient(x) if stop_grad else x
        adv = mlp(x_adv, 1, 'adv')
        con = mlp(x, self.projection_features, 'con')
        supcon = mlp(x, self.projection_features, 'supcon')
        return (adv.astype(jnp.float32), con.astype(jnp.float32),
                supcon.astype(jnp.float32))


class Discriminator(nn.Module):
    '''StyleGAN2-D trunk (feature_only) + Projector (reference
    Discriminator, model.py:144 / utils.py:285-295).'''
    image_size: int = 128
    image_channels: int = 3
    channels: int = 32
    max_channels: int = 512
    block_num_conv: int = 2
    mbsd_groups: int = 4
    mbsd_grouping: str = 'strided'
    projection_features: int = 256
    hidden_features: int = 256
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, stop_grad: bool = False):
        feat = _SG2Discriminator(
            image_size=self.image_size, image_channels=self.image_channels,
            channels=self.channels, max_channels=self.max_channels,
            block_num_conv=self.block_num_conv,
            mbsd_groups=self.mbsd_groups,
            mbsd_grouping=self.mbsd_grouping, feature_only=True,
            dtype=self.dtype, name='extractor')(x)
        return Projector(self.projection_features, self.hidden_features,
                         self.act_name, self.dtype)(feat, stop_grad)
