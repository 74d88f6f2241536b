'''HiT — high-resolution transformer GAN (reference `implementations/HiT/
model.py`: MultiAxisAttention :55, MultiQueryAttention :87, low/high-res
stages :171/:201). Token-grid generator: low-res stages use blocked multi-axis
attention (the windowed/dilated split), high-res stages are MLP-only; every
stage cross-attends to latent tokens via multi-query attention. All attention
is einsum-on-MXU. D is a simple residual conv net with minibatch-stddev
(constant width, mirroring the reference's ladder).'''

from __future__ import annotations

import math
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.StyleGAN2.model import MiniBatchStdDev


def block_tokens(x, patch: int):
    '''[B, H*W, C] -> [B, numblocks, patch², C] (reference block :29).'''
    B, N, C = x.shape
    H = W = int(math.isqrt(N))
    x = x.reshape(B, H // patch, patch, W // patch, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // patch) * (W // patch), patch * patch, C)


def unblock_tokens(x):
    B, M, N, C = x.shape
    H = int(math.isqrt(M))
    patch = int(math.isqrt(N))
    x = x.reshape(B, H, H, patch, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H * patch) ** 2, C)


def token_pixel_shuffle(x):
    '''[B, N, C] -> [B, 4N, C//4].'''
    B, N, C = x.shape
    H = int(math.isqrt(N))
    x = x.reshape(B, H, H, C)
    x = x.reshape(B, H, H, 2, 2, C // 4)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 4 * N, C // 4)


class MultiAxisAttention(nn.Module):
    '''Half the heads attend across blocks (dilated axis), half within
    blocks (local axis) (reference :55).'''
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, M(blocks), N(patch²), C]
        q_w = self.param('q', nn.initializers.normal(0.02),
                         (self.num_heads, self.dim, self.dim))
        k_w = self.param('k', nn.initializers.normal(0.02),
                         (self.dim, self.dim))
        v_w = self.param('v', nn.initializers.normal(0.02),
                         (self.dim, self.dim))
        o_w = self.param('o', nn.initializers.normal(0.02),
                         (self.num_heads, self.dim, self.dim))
        xd = x.astype(self.dtype)
        Q = jnp.einsum('bmnd,hdk->bhmnk', xd, q_w.astype(self.dtype))
        h2 = self.num_heads // 2
        Q1, Q2 = Q[:, :h2], Q[:, h2:]
        K = jnp.einsum('bmnd,dk->bmnk', xd, k_w.astype(self.dtype))
        V = jnp.einsum('bmnd,dv->bmnv', xd, v_w.astype(self.dtype))

        # attend across the block axis (same position, all blocks)
        logits = jnp.einsum('bhxyk,bzyk->bhyxz', Q1, K,
                            preferred_element_type=jnp.float32)
        O1 = jnp.einsum('bhyxz,bzyv->bhxyv',
                        jax.nn.softmax(logits, -1).astype(V.dtype), V)
        # attend within each block
        logits = jnp.einsum('bhxyk,bxzk->bhxyz', Q2, K,
                            preferred_element_type=jnp.float32)
        O2 = jnp.einsum('bhxyz,bxzv->bhxyv',
                        jax.nn.softmax(logits, -1).astype(V.dtype), V)

        O = jnp.concatenate([O1, O2], axis=1)
        return jnp.einsum('bhmnd,hdv->bmnd', O, o_w.astype(self.dtype))


class MultiQueryAttention(nn.Module):
    '''Cross-attention from feature tokens to latent tokens (reference :87).'''
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        B, xN, _ = x.shape
        hd = self.dim // self.num_heads
        Q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(x)
        KV = nn.Dense(self.dim * 2, use_bias=False, dtype=self.dtype)(
            z.astype(x.dtype))
        Q = Q.reshape(B, xN, self.num_heads, hd)
        K, V = jnp.split(KV.reshape(B, -1, 2, self.num_heads, hd), 2, axis=2)
        K, V = K[:, :, 0], V[:, :, 0]
        attn = jnp.einsum('bqhc,bkhc->bhqk', Q, K,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, -1).astype(V.dtype)
        O = jnp.einsum('bhqk,bkhc->bqhc', attn, V).reshape(B, xN, self.dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(O)


class MLP(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


class Stage(nn.Module):
    '''One resolution stage; low-res uses MAA blocks, high-res MLP blocks.'''
    dim: int
    out_dim: int | None
    num_heads: int
    num_blocks: int
    patch_size: int | None          # None -> high-res stage
    is_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        N = x.shape[1]
        pe = self.param('pos_embed', nn.initializers.zeros_init(),
                        (1, N, self.dim))
        x = x + pe.astype(x.dtype)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + MultiQueryAttention(self.dim, self.num_heads,
                                    self.dtype)(h, z)
        x = x + MLP(self.dim, self.dtype)(nn.LayerNorm(dtype=self.dtype)(x))
        for _ in range(self.num_blocks):
            if self.patch_size is not None:
                h = nn.LayerNorm(dtype=self.dtype)(x)
                attn_in = block_tokens(h, self.patch_size)
                attn_out = unblock_tokens(MultiAxisAttention(
                    self.dim, self.num_heads, self.dtype)(attn_in))
                x = x + attn_out
            x = x + MLP(self.dim, self.dtype)(
                nn.LayerNorm(dtype=self.dtype)(x))

        image = None
        if self.patch_size is None:  # high-res stages emit RGB
            image = nn.Dense(3, dtype=jnp.float32)(x.astype(jnp.float32))
        if not self.is_last:
            x = token_pixel_shuffle(x)
            x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        return x, image


class Generator(nn.Module):
    latent_dim: int = 128
    dims: Sequence[int] = (512, 512, 256, 128, 64, 64)
    bottom: int = 8
    low_stages: int = 4
    num_heads: Sequence[int] = (16, 8, 4, 4, 4, 4)
    num_blocks: Sequence[int] = (2, 2, 2, 2, 2, 2)
    patch_sizes: Sequence[int] = (4, 4, 8, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z_in):
        B = z_in.shape[0]
        x = nn.Dense(self.dims[0] * self.bottom ** 2, dtype=self.dtype)(
            z_in.astype(self.dtype))
        x = x.reshape(B, self.bottom ** 2, self.dims[0])
        z = nn.Dense(self.latent_dim * self.bottom ** 2,
                     dtype=self.dtype)(z_in.astype(self.dtype))
        z = z.reshape(B, self.bottom ** 2, self.latent_dim)
        zpe = self.param('z_pos_embed', nn.initializers.zeros_init(),
                         (1, self.bottom ** 2, self.latent_dim))
        z = z + zpe.astype(z.dtype)

        image = None
        for i, dim in enumerate(self.dims):
            is_last = i == len(self.dims) - 1
            out_dim = None if is_last else self.dims[i + 1]
            patch = self.patch_sizes[i] if i < self.low_stages else None
            x, img = Stage(dim, out_dim, self.num_heads[i],
                           self.num_blocks[i], patch, is_last,
                           self.dtype)(x, z)
            if img is not None:
                S = int(math.isqrt(img.shape[1]))
                img = img.reshape(B, S, S, 3)
                if image is None:
                    image = img
                else:
                    image = jax.image.resize(
                        image, (B, S, S, 3), method='nearest') + img
        return image


class Discriminator(nn.Module):
    '''Flat-width ResBlock D (reference HiT model.py:404-435 — note the
    reference's own width rule is `min(channels, max_channels)`, i.e. flat
    at `channels` throughout; reproduced as-is).'''
    image_size: int = 128
    channels: int = 32
    max_channels: int = 512
    act_name: str = 'lrelu'
    bottom: int = 8
    mbsd_groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from animeface_tpu.nnutils.module.layers import get_activation
        act = get_activation(self.act_name)
        num_downs = int(math.log2(self.image_size) - math.log2(self.bottom))
        c = min(self.channels, self.max_channels)
        x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype))
        x = act(x)
        for _ in range(num_downs):
            h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(x)
            h = act(h)
            h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            t = nn.Conv(c, (1, 1), dtype=self.dtype)(x)
            t = nn.avg_pool(t, (2, 2), strides=(2, 2))
            x = (h + t) / np.sqrt(2)
        x = MiniBatchStdDev(self.mbsd_groups)(x)
        x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(x)
        x = act(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(c, dtype=self.dtype)(x)
        x = act(x)
        return nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))
