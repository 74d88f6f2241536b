'''SCFT (reference `implementations/SCFT/model.py`): reference-based sketch
colorization — sketch/reference encoders whose per-layer features are
avg-pooled to the bottom grid and concatenated, SCFT KQV cross-attention
(:207) from sketch queries to reference keys/values (returning q,k for the
similarity triplet loss), residual bottleneck, skip-concat decoder.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _inorm(dtype):
    return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)


class ConvBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=1, dtype=self.dtype)(x)
        x = _inorm(self.dtype)(x)
        return jax.nn.leaky_relu(x, 0.2)


class Encoder(nn.Module):
    '''Per-resolution conv stacks; all intermediate features are avg-pooled
    to the bottom grid and channel-concatenated (reference Encoder :90).'''
    image_size: int = 128
    bottom_width: int = 8
    channels: int = 16
    layer_per_resl: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_down = int(np.log2(self.image_size) - np.log2(self.bottom_width))
        feats = []
        c = self.channels
        x = x.astype(self.dtype)
        for i in range(self.layer_per_resl):
            x = ConvBlock(c, 1, self.dtype)(x)
            feats.append(x)
        for _ in range(num_down):
            c *= 2
            for i in range(self.layer_per_resl):
                x = ConvBlock(c, 2 if i == 0 else 1, self.dtype)(x)
                feats.append(x)
        bw = self.bottom_width
        pooled = []
        for f in feats:
            k = f.shape[1] // bw
            pooled.append(nn.avg_pool(f, (k, k), strides=(k, k))
                          if k > 1 else f)
        return jnp.concatenate(pooled, axis=-1), feats


class SCFT(nn.Module):
    '''Cross-attention: sketch queries over reference keys/values (:207).'''
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref, sketch):
        B, H, W, C = ref.shape
        r = ref.reshape(B, H * W, C)
        s = sketch.reshape(B, H * W, C)
        kv = nn.Dense(C * 2, use_bias=False, dtype=self.dtype)(r)
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Dense(C, use_bias=False, dtype=self.dtype)(s)
        attn = jnp.einsum('bqc,bkc->bqk', q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, -1) / np.sqrt(C)
        heat = jnp.einsum('bqk,bkc->bqc', attn.astype(v.dtype), v)
        out = (s + heat).reshape(B, H, W, C)
        return out, (q.astype(jnp.float32), k.astype(jnp.float32))


class Generator(nn.Module):
    image_size: int = 128
    in_channels: int = 1
    ref_channels: int = 3
    bottom_width: int = 8
    enc_channels: int = 16
    layer_per_resl: int = 2
    num_res_blocks: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sketch, ref, return_qk: bool = False):
        num_ups = int(np.log2(self.image_size) - np.log2(self.bottom_width))
        ref_feat, _ = Encoder(self.image_size, self.bottom_width,
                              self.enc_channels, self.layer_per_resl,
                              self.dtype, name='ref_encoder')(ref)
        sk_feat, sk_feats = Encoder(self.image_size, self.bottom_width,
                                    self.enc_channels, self.layer_per_resl,
                                    self.dtype, name='sketch_encoder')(sketch)
        x, qk = SCFT(self.dtype)(ref_feat, sk_feat)

        C = x.shape[-1]
        h = x
        for _ in range(self.num_res_blocks):
            r = ConvBlock(C, 1, self.dtype)(h)
            r = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype)(r)
            h = (h + r) / np.sqrt(2)
        h = jnp.concatenate([h, x], axis=-1)

        # decoder: upsample with skip concat of the last sketch feature at
        # each resolution
        skips = sk_feats[self.layer_per_resl - 1::self.layer_per_resl][::-1]
        c = self.enc_channels * 2 ** num_ups
        for i in range(num_ups):
            c //= 2
            h = ConvBlock(c, 1, self.dtype)(h)
            N, H, W, Ch = h.shape
            h = jax.image.resize(h, (N, H * 2, W * 2, Ch), method='bilinear')
            h = jnp.concatenate([h, skips[i + 1]], axis=-1)
        h = ConvBlock(self.enc_channels, 1, self.dtype)(h)
        out = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)(h)
        out = jnp.tanh(out.astype(jnp.float32))
        if return_qk:
            return out, qk
        return out


class Discriminator(nn.Module):
    '''Patch D on (sketch ‖ image) (reference reuses a conv patch D).'''
    channels: int = 32
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x.astype(self.dtype))
        x = jax.nn.leaky_relu(x, 0.2)
        feats = [x]
        for _ in range(self.num_layers):
            c *= 2
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(x)
            x = _inorm(self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
            feats.append(x)
        logits = nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)),
                         dtype=self.dtype)(x)
        return logits.astype(jnp.float32), feats
