'''PEinGAN (reference `implementations/PEinGAN/model.py`): "Positional
Encoding as Spatial Inductive Bias in GANs" — a StyleGAN2-style generator
whose constant input is replaced by a 2D sinusoidal positional embedding grid
(SPE2d :240, Generator :474), enabling multi-scale synthesis: the SPE grid is
generated at any requested bottom size and the same convs synthesize larger /
smaller images. `--no-spe` swaps a learned constant back in (reference `spe`
flag); style mixing follows `to_syn_input` :529-545 — two mapped styles with
a random crossover stage, applied with probability mix_prob, drawn inside the
jitted step. D (:562) uses a mean-pool epilogue down at `d_bottom` so one
parameter set covers all training scales (`--no-gap` switches to the
size-pinned flatten-Dense epilogue). The reference's `pad`/`filter_size`/
`act_name` knobs are accepted for CLI parity; the TPU synthesis keeps
SAME-padded convs (the SPE grid supplies the spatial bias), the fixed
[1,3,3,1] blur, and lrelu activations of the shared StyleGAN2 blocks.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.StyleGAN2.model import (
    ELRDense, ELRConv, ModulatedConv, InjectNoise, Mapping, MiniBatchStdDev,
    DBlock, StyleBlock, ToImage,
)


def spe2d(height: int, width: int, embedding_dim: int):
    '''2D sinusoidal positional embedding [H, W, 2*embedding_dim] (ref :240):
    row and column 1-D SPEs concatenated channel-wise.'''
    half = embedding_dim // 2
    freq = np.exp(np.arange(half) * (-np.log(10000.0) / (half - 1)))

    def spe1d(n):
        pos = np.arange(1, n + 1)[:, None] * freq[None, :]
        return np.concatenate([np.sin(pos), np.cos(pos)], axis=1)  # [n, dim]

    row = spe1d(height)[:, None, :]       # [H,1,dim]
    col = spe1d(width)[None, :, :]        # [1,W,dim]
    grid = np.concatenate([
        np.broadcast_to(row, (height, width, embedding_dim)),
        np.broadcast_to(col, (height, width, embedding_dim)),
    ], axis=-1)
    return jnp.asarray(grid, jnp.float32)


class Generator(nn.Module):
    '''StyleGAN2 synthesis over an SPE2d input grid; `bottom` selects the
    synthesis scale (static per compiled step).'''
    image_size: int = 128
    latent_dim: int = 512
    style_dim: int = 512
    in_channels: int = 512
    out_channels: int = 3
    channels: int = 32
    max_channels: int = 512
    map_num_layers: int = 8
    map_lr: float = 0.01
    pixelnorm: bool = True
    use_spe: bool = True
    embed_dim: int = 128
    mix_prob: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, bottom: int = 4, mix_key=None):
        '''`z`: [B, latent_dim] or [B, 2, latent_dim] (style mixing — a
        random crossover stage applied with prob mix_prob, reference
        to_syn_input :529).'''
        num_ups = int(np.log2(self.image_size)) - 2
        chans = self.channels * 2 ** num_ups
        ladder = [min(self.max_channels, chans // 2 ** i)
                  for i in range(num_ups + 1)]
        ladder[0] = self.in_channels
        n_stages = num_ups + 1

        mapping = Mapping(self.style_dim, self.map_num_layers,
                          self.pixelnorm, self.map_lr)
        if z.ndim == 3 and mix_key is not None:
            w1 = mapping(z[:, 0])
            w2 = mapping(z[:, 1])
            k1, k2 = jax.random.split(mix_key)
            cross = jax.random.randint(k1, (), 1, n_stages)
            do_mix = jax.random.uniform(k2, ()) <= self.mix_prob
            w_for = lambda stage: jnp.where(do_mix & (stage >= cross), 1., 0.)\
                [None, None] * (w2 - w1) + w1
        else:
            w1 = mapping(z if z.ndim == 2 else z[:, 0])
            w_for = lambda stage: w1

        if self.use_spe:
            grid = spe2d(bottom, bottom, self.embed_dim)
            x = jnp.broadcast_to(grid[None], (z.shape[0],) + grid.shape)
        else:
            const = self.param('const', nn.initializers.normal(1.0),
                               (bottom, bottom, 2 * self.embed_dim))
            x = jnp.broadcast_to(const[None],
                                 (z.shape[0],) + const.shape)
        x = x.astype(self.dtype)
        w = w_for(0)
        x = ModulatedConv(ladder[0], 3, dtype=self.dtype)(x, w)
        x = InjectNoise()(x)
        x = jax.nn.leaky_relu(x, 0.2)
        pre = ToImage(self.out_channels, upsample=True, dtype=self.dtype)(x, w)
        image = pre
        for i, ch in enumerate(ladder[1:]):
            last = i == num_ups - 1
            w = w_for(i + 1)
            x = StyleBlock(ch, 2, dtype=self.dtype)(x, w)
            image = ToImage(self.out_channels, upsample=not last,
                            dtype=self.dtype)(x, w, pre)
            pre = image
        return jnp.tanh(image.astype(jnp.float32)), w1


class Discriminator(nn.Module):
    '''Residual D; GAP epilogue at `bottom` is size-agnostic (reference
    :562); `no_gap` pins the size with flatten-Dense like StyleGAN2.'''
    image_size: int = 128
    channels: int = 32
    max_channels: int = 512
    mbsd_groups: int = 4
    bottom: int = 2
    no_gap: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        chans = self.channels
        x = ELRConv(chans, 1, dtype=self.dtype)(x.astype(self.dtype))
        x = jax.nn.leaky_relu(x, 0.2)
        resl = self.image_size
        och = chans
        while resl > max(4, self.bottom * 2):
            resl //= 2
            chans *= 2
            och = min(self.max_channels, chans)
            x = DBlock(och, 2, dtype=self.dtype)(x)
        x = MiniBatchStdDev(self.mbsd_groups)(x)
        x = ELRConv(och, 3, dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        if self.no_gap:
            x = x.reshape(x.shape[0], -1)   # size-pinned
        else:
            x = jnp.mean(x, axis=(1, 2))    # size-agnostic
        x = ELRDense(och, dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        return ELRDense(1, dtype=self.dtype)(x).astype(jnp.float32)
