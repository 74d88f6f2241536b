'''SCFT (reference `implementations/SCFT/model.py`): reference-based sketch
colorization — sketch/reference encoders whose per-layer features are
avg-pooled to the bottom grid and concatenated, SCFT KQV cross-attention
(:207) from sketch queries to reference keys/values (returning q,k for the
similarity triplet loss), residual bottleneck, and the reference's
zip-decoder: every decoder stage consumes `concat([x, feat])` with the
encoder features + residual output reversed (:196-203).

Knobs match the reference Generator/Discriminator signatures (:236, :283):
sn, bias, scft_bias, norm_name, act_name, num_layers, ref_channels.
TPU deltas: NHWC layout; `nn.Upsample(bilinear, align_corners=True)` is
`jax.image.resize('bilinear')` (half-pixel centers); spectral norm is flax
`nn.SpectralNorm` power iteration carried in batch_stats.
'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation, get_normalization


class ConvBlock(nn.Module):
    '''conv -> norm -> act with optional SN (reference model.py:33).'''
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.Conv(self.features, (self.kernel_size,) * 2,
                       strides=(self.strides,) * 2,
                       padding=((self.padding,) * 2,) * 2,
                       use_bias=self.use_bias, dtype=self.dtype)
        x = nn.SpectralNorm(conv)(x, update_stats=train) if self.sn \
            else conv(x)
        x = get_normalization(self.norm_name, self.features,
                              dtype=self.dtype)(x)
        return get_activation(self.act_name)(x)


class ResBlock(nn.Module):
    '''(conv norm act) x (n-1), conv norm; act(x + h)/sqrt(2)
    (reference model.py:50).'''
    features: int
    num_conv: int = 2
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x
        for _ in range(self.num_conv - 1):
            h = ConvBlock(self.features, 3, 1, 1, self.sn, self.use_bias,
                          self.norm_name, self.act_name, self.dtype)(h, train)
        conv = nn.Conv(self.features, (3, 3), padding=1,
                       use_bias=self.use_bias, dtype=self.dtype)
        h = nn.SpectralNorm(conv)(h, update_stats=train) if self.sn \
            else conv(h)
        h = get_normalization(self.norm_name, self.features,
                              dtype=self.dtype)(h)
        return get_activation(self.act_name)(x + h) / np.sqrt(2)


class Encoder(nn.Module):
    '''Per-resolution conv stacks; all intermediate features are avg-pooled
    to the bottom grid and channel-concatenated (reference Encoder :90).'''
    in_channels: int = 3
    image_size: int = 128
    bottom_width: int = 8
    channels: int = 16
    layer_per_resl: int = 2
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_down = int(np.log2(self.image_size) - np.log2(self.bottom_width))
        feats = []
        c = self.channels
        x = x.astype(self.dtype)

        def block(x, c, stride):
            return ConvBlock(c, 3, stride, 1, self.sn, self.use_bias,
                             self.norm_name, self.act_name,
                             self.dtype)(x, train)

        for i in range(self.layer_per_resl):
            x = block(x, c, 1)
            feats.append(x)
        for _ in range(num_down):
            c *= 2
            for i in range(self.layer_per_resl):
                x = block(x, c, 2 if i == 0 else 1)
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
    sn: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref, sketch, train: bool = True):
        B, H, W, C = ref.shape
        r = ref.reshape(B, H * W, C)
        s = sketch.reshape(B, H * W, C)
        kv_l = nn.Dense(C * 2, use_bias=self.use_bias, dtype=self.dtype)
        q_l = nn.Dense(C, use_bias=self.use_bias, dtype=self.dtype)
        if self.sn:
            kv = nn.SpectralNorm(kv_l)(r, update_stats=train)
            q = nn.SpectralNorm(q_l)(s, update_stats=train)
        else:
            kv, q = kv_l(r), q_l(s)
        k, v = jnp.split(kv, 2, axis=-1)
        attn = jnp.einsum('bqc,bkc->bqk', q, k,
                          preferred_element_type=jnp.float32)
        # reference: attn.softmax(-1) / sqrt(C) (model.py:227)
        attn = jax.nn.softmax(attn, -1) / np.sqrt(C)
        heat = jnp.einsum('bqk,bkc->bqc', attn.astype(v.dtype), v)
        out = (s + heat).reshape(B, H, W, C)
        return out, (q.astype(jnp.float32), k.astype(jnp.float32))


class Generator(nn.Module):
    '''Reference Generator (model.py:236).'''
    image_size: int = 128
    in_channels: int = 1
    ref_channels: int = 3
    bottom_width: int = 8
    enc_channels: int = 16
    layer_per_resl: int = 2
    num_res_blocks: int = 7
    sn: bool = True
    use_bias: bool = True
    scft_bias: bool = False
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sketch, ref, return_qk: bool = False,
                 train: bool = True):
        num_ups = int(np.log2(self.image_size) - np.log2(self.bottom_width))
        common = (self.sn, self.use_bias, self.norm_name, self.act_name,
                  self.dtype)
        # reference forward (model.py:262-268): sketch_encoder feeds BOTH
        # scft and the decoder skips; ref_encoder only feeds scft keys/values
        ref_feat, _ = Encoder(self.ref_channels, self.image_size,
                              self.bottom_width, self.enc_channels,
                              self.layer_per_resl, *common,
                              name='ref_encoder')(ref, train)
        sk_feat, sk_feats = Encoder(self.in_channels, self.image_size,
                                    self.bottom_width, self.enc_channels,
                                    self.layer_per_resl, *common,
                                    name='sketch_encoder')(sketch, train)
        x, qk = SCFT(self.sn, self.scft_bias, self.dtype)(
            ref_feat, sk_feat, train)

        res = x
        for _ in range(self.num_res_blocks):
            res = ResBlock(res.shape[-1], 2, *common)(res, train)

        # zip-decoder (reference Decoder :139-203): features reversed;
        # each stage consumes concat([x, feat]); the last layer of each
        # resolution block upsamples 2x after the concat
        dec_feats = (sk_feats + [res])[::-1]
        stages = []   # (out_features, upsample, final)
        c = self.enc_channels * 2 ** num_ups
        stages.append((c, False, False))
        for _ in range(num_ups):
            c //= 2
            for i in range(self.layer_per_resl):
                stages.append((c, i == self.layer_per_resl - 1, False))
        stages.append((c, False, False))
        stages.append((self.ref_channels, False, True))

        x = sk_feat
        for (och, up, final), feat in zip(stages, dec_feats):
            x = jnp.concatenate([x, feat.astype(x.dtype)], axis=-1)
            if up:
                N, H, W, C = x.shape
                x = jax.image.resize(x, (N, H * 2, W * 2, C),
                                     method='bilinear')
            if final:
                conv = nn.Conv(och, (3, 3), padding=1,
                               use_bias=self.use_bias, dtype=self.dtype)
                h = nn.SpectralNorm(conv)(x, update_stats=train) \
                    if self.sn else conv(x)
                x = jnp.tanh(h.astype(jnp.float32))
            else:
                x = ConvBlock(och, 3, 1, 1, *common)(x, train)
        out = x
        if return_qk:
            return out, qk
        return out


class Discriminator(nn.Module):
    '''Patch D on (sketch ‖ image) (reference model.py:283): k4 s2 VALID
    convs + norm + act, final k4 VALID conv.'''
    in_channels: int = 4
    num_layers: int = 3
    channels: int = 32
    sn: bool = True
    use_bias: bool = True
    norm_name: str = 'in'
    act_name: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def conv(x, features, strides):
            c = nn.Conv(features, (4, 4), strides=(strides,) * 2,
                        padding='VALID', use_bias=self.use_bias,
                        dtype=self.dtype)
            return nn.SpectralNorm(c)(x, update_stats=train) if self.sn \
                else c(x)

        c = self.channels
        x = conv(x.astype(self.dtype), c, 2)
        x = get_activation(self.act_name)(x)
        feats = [x]
        for _ in range(self.num_layers):
            c *= 2
            x = conv(x, c, 2)
            x = get_normalization(self.norm_name, c, dtype=self.dtype)(x)
            x = get_activation(self.act_name)(x)
            feats.append(x)
        logits = conv(x, 1, 1)
        assert logits.shape[1] > 0 and logits.shape[2] > 0, (
            f'{logits.shape}: patch grid collapsed — the reference D '
            'is sized for 128px; raise image_size or lower num_layers')
        return logits.astype(jnp.float32), feats
