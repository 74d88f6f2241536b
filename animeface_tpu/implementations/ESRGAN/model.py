'''ESRGAN (reference `implementations/ESRGAN/model.py`): RRDB (residual-in-
residual dense block) generator (:39,71,91) with nearest-upsample + conv,
reusing SRGAN's multi-scale discriminator. Relativistic-style losses live in
the recipe.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import (
    MaybeSNConv, Discriminator, _act,
)


class DenseBlock(nn.Module):
    channels: int
    hid_channels: int
    num_conv: int = 5
    sn: bool = True
    act_name: str = 'lrelu'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = [x]
        h = MaybeSNConv(self.hid_channels, 3, sn=self.sn,
                        use_bias=self.use_bias, dtype=self.dtype)(x, train)
        h = _act(self.act_name)(h)
        for _ in range(self.num_conv - 2):
            feats.append(h)
            h = MaybeSNConv(self.hid_channels, 3, sn=self.sn,
                            use_bias=self.use_bias, dtype=self.dtype)(
                jnp.concatenate(feats, axis=-1), train)
            h = _act(self.act_name)(h)
        feats.append(h)
        return MaybeSNConv(self.channels, 3, sn=self.sn,
                           use_bias=self.use_bias, dtype=self.dtype)(
            jnp.concatenate(feats, axis=-1), train)


class RRDB(nn.Module):
    '''Residual-in-residual dense block, residuals scaled 1/sqrt(2) (:71).'''
    channels: int
    hid_channels: int
    num_dense: int = 3
    num_conv: int = 5
    sn: bool = True
    act_name: str = 'lrelu'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x
        for _ in range(self.num_dense):
            d = DenseBlock(self.channels, self.hid_channels, self.num_conv,
                           self.sn, self.act_name, self.use_bias,
                           self.dtype)(h, train)
            h = (h + d) / np.sqrt(2)
        return (x + h) / np.sqrt(2)


class Generator(nn.Module):
    scale: int = 2
    image_channels: int = 3
    channels: int = 64
    hid_channels: int = 32
    num_rrdb: int = 7          # reference num_blocks default (utils.py:134)
    num_rd: int = 3
    num_conv: int = 5
    sn: bool = True
    act_name: str = 'lrelu'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_ups = int(np.log2(self.scale))
        x = MaybeSNConv(self.channels, 7, sn=self.sn,
                        use_bias=self.use_bias, dtype=self.dtype)(
            x.astype(self.dtype), train)
        t = x
        for _ in range(self.num_rrdb):
            x = RRDB(self.channels, self.hid_channels, self.num_rd,
                     self.num_conv, self.sn, self.act_name, self.use_bias,
                     self.dtype)(x, train)
        x = MaybeSNConv(self.channels, 3, sn=self.sn,
                        use_bias=self.use_bias, dtype=self.dtype)(x, train)
        x = (x + t) / np.sqrt(2)
        for _ in range(num_ups):
            N, H, W, C = x.shape
            x = jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')
            x = MaybeSNConv(self.channels, 3, sn=self.sn,
                            use_bias=self.use_bias, dtype=self.dtype)(x, train)
            x = _act(self.act_name)(x)
        x = MaybeSNConv(self.image_channels, 7, sn=self.sn,
                        use_bias=self.use_bias, dtype=self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))
