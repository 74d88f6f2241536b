'''TransGAN (reference `implementations/TransGAN/model.py`): pure-transformer
G (per-resolution encoder stacks with pixel-shuffle token upsampling,
Attention :34, Upsample :96) and ViT-style cls-token D (:172-230), with the
reference's full knob surface — qkv bias, attention/projection dropout, MLP
dropout (MLP :14, Attention :34, EncoderBlock :75), act/norm names.
Flax; attention einsums hit the MXU directly. Dropout is active whenever a
'dropout' rng is provided (training steps pass one; samplers do not), which
replaces torch's train()/eval() mode flag.'''

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.implementations.SRGAN.model import pixel_shuffle
from animeface_tpu.nnutils.module.layers import get_activation


def _n002():
    return nn.initializers.normal(0.02)


class Attention(nn.Module):
    num_heads: int = 4
    qkv_bias: bool = False
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        det = not self.has_rng('dropout')
        hd = C // self.num_heads
        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, kernel_init=_n002(),
                       dtype=self.dtype)(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum('bqhc,bkhc->bhqk', q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.attn_dropout, deterministic=det)(attn)
        out = jnp.einsum('bhqk,bkhc->bqhc', attn, v).reshape(B, N, C)
        out = nn.Dense(C, kernel_init=_n002(), dtype=self.dtype)(out)
        return nn.Dropout(self.proj_dropout, deterministic=det)(out)


class EncoderBlock(nn.Module):
    num_heads: int = 4
    mlp_ratio: int = 4
    qkv_bias: bool = False
    attn_dropout: float = 0.0
    dropout: float = 0.0
    act_name: str = 'gelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        det = not self.has_rng('dropout')
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + Attention(self.num_heads, self.qkv_bias, self.attn_dropout,
                          self.dropout, self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(C * self.mlp_ratio, kernel_init=_n002(),
                     dtype=self.dtype)(h)
        h = get_activation(self.act_name)(h)
        h = nn.Dense(C, kernel_init=_n002(), dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        return x + h


def token_upsample(x):
    '''[B, N, C] -> [B, 4N, C/4] via spatial pixel shuffle (reference :96).'''
    B, N, C = x.shape
    H = int(np.sqrt(N))
    x = x.reshape(B, H, H, C)
    x = pixel_shuffle(x, 2)
    return x.reshape(B, 4 * N, C // 4)


class Generator(nn.Module):
    depths: Sequence[int] = (5, 4, 2)
    latent_dim: int = 128
    image_channels: int = 3
    bottom_width: int = 8
    embed_dim: int = 1024
    num_heads: int = 4
    mlp_ratio: int = 4
    qkv_bias: bool = False
    dropout: float = 0.0
    attn_dropout: float = 0.0
    act_name: str = 'gelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        resl = self.bottom_width
        dim = self.embed_dim
        x = nn.Dense(resl ** 2 * dim, kernel_init=_n002(),
                     dtype=self.dtype)(z.astype(self.dtype))
        x = x.reshape(z.shape[0], resl ** 2, dim)
        num_ups = len(self.depths) - 1
        for index, depth in enumerate(self.depths):
            pe = self.param(f'pos_embed_{index}', _n002(),
                            (1, resl ** 2, dim))
            x = x + pe.astype(x.dtype)
            for _ in range(depth):
                x = EncoderBlock(self.num_heads, self.mlp_ratio,
                                 self.qkv_bias, self.attn_dropout,
                                 self.dropout, self.act_name, self.dtype)(x)
            if index < num_ups:
                x = token_upsample(x)
                resl *= 2
                dim //= 4
        x = x.reshape(z.shape[0], resl, resl, dim)
        x = nn.Conv(self.image_channels, (1, 1), kernel_init=_n002(),
                    dtype=self.dtype)(x)
        return x.astype(jnp.float32)

    @staticmethod
    def depths_len_from_target_width(target_width, bottom_width=8):
        return int(np.log2(target_width) - np.log2(bottom_width)) + 1


class Discriminator(nn.Module):
    depth: int = 7
    image_size: int = 128
    patch_size: int = 8
    image_channels: int = 3
    embed_dim: int = 384
    num_heads: int = 4
    mlp_ratio: int = 4
    qkv_bias: bool = False
    dropout: float = 0.0
    attn_dropout: float = 0.0
    act_name: str = 'gelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding='VALID',
                    kernel_init=_n002(), dtype=self.dtype)(
            x.astype(self.dtype))
        x = x.reshape(B, -1, self.embed_dim)
        cls = self.param('cls_token', _n002(), (1, 1, self.embed_dim))
        x = jnp.concatenate(
            [x, jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(x.dtype)],
            axis=1)
        pe = self.param('pos_embed', _n002(), (1, x.shape[1], self.embed_dim))
        x = x + pe.astype(x.dtype)
        for _ in range(self.depth):
            x = EncoderBlock(self.num_heads, self.mlp_ratio, self.qkv_bias,
                             self.attn_dropout, self.dropout, self.act_name,
                             self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = x[:, -1]
        return nn.Dense(1, kernel_init=_n002(),
                        dtype=jnp.float32)(x.astype(jnp.float32))
