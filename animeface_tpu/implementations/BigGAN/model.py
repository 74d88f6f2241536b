'''Unconditional BigGAN / BigGAN-deep (reference `implementations/BigGAN/model.py`:
ConditionalNorm2d :35, GBlock :79 / GBlockdeep :123, DBlock :180 /
DBlockdeep :211, SelfAttention :259, LambdaLayer :291, arch tables
GEN_ARCH :353 / GEN_ARCH_DEEP :376 / DIS_ARCH :458 / DIS_ARCH_DEEP :482).
z feeds every conditional-norm layer; hinge loss; EMA G. Flax NHWC;
self-attention as batched MXU einsums. The reference's published 128/256/512
multiplier tables are reproduced verbatim (they ARE the behavior) and
extended down to 32/64px for small runs; the deep tables are derived by the
same two-blocks-per-stage expansion the published tables follow.'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

# reference GEN_ARCH out-multipliers :353 (in = [16] + out[:-1]) and
# DIS_ARCH out-multipliers :458 (in = [0] + out[:-1]); att = attention resl
_GEN_OUT = {128: [16, 8, 4, 2, 1],
            256: [16, 8, 8, 4, 2, 1],
            512: [16, 8, 8, 4, 2, 1, 1]}
_GEN_ATT = {128: 64, 256: 128, 512: 64}
_DIS_OUT = {128: [2, 4, 8, 16, 16, 16],
            256: [2, 4, 8, 8, 16, 16, 16],
            512: [1, 2, 4, 8, 8, 16, 16, 16]}


def _arch(image_size: int, deep: bool = False):
    '''G/D ladders (reference GEN_ARCH/DIS_ARCH, deep :376/:482).

    Returns gen = dict(inm, out, up, resl, att) and
    dis = dict(inm, out, down, resl, att, input_conv) where inm entry 0 means
    "image channels" for D. Deep ladders follow the reference's expansion:
    every G up-stage (m_in -> m_out) becomes [m_in->m_in no-up,
    m_in->m_out up]; every D down-stage becomes [prev->m down, m->m flat]
    behind a plain 3x3 input conv — matches GEN_ARCH_DEEP/DIS_ARCH_DEEP
    verbatim at 128/256/512.'''
    n_up = int(np.log2(image_size)) - 2          # from 4x4
    g_out = _GEN_OUT.get(image_size, [16, 8, 8, 4, 2, 1][-n_up:])
    g_in = [16] + g_out[:-1]
    g_resl = [2 ** (3 + i) for i in range(n_up)]
    g_att = _GEN_ATT.get(image_size, min(64, image_size // 2))
    d_out = _DIS_OUT.get(image_size,
                         ([2, 4, 8, 16, 16][:n_up] + [16])[-(n_up + 1):])
    d_att = 64 if image_size in _DIS_OUT else min(64, image_size // 2)
    d_resl = [image_size // 2 ** (i + 1) for i in range(n_up)] + [4]

    if not deep:
        gen = dict(inm=g_in, out=g_out, up=[True] * n_up, resl=g_resl,
                   att=g_att)
        dis = dict(inm=[0] + d_out[:-1], out=d_out,
                   down=[True] * n_up + [False], resl=d_resl, att=d_att,
                   input_conv=False)
        return gen, dis

    gen = dict(inm=[], out=[], up=[], resl=[], att=64 if image_size in
               _GEN_ATT else g_att)
    for i, (m_in, m_out) in enumerate(zip(g_in, g_out)):
        gen['inm'] += [m_in, m_in]
        gen['out'] += [m_in, m_out]
        gen['up'] += [False, True]
        gen['resl'] += [g_resl[i] // 2, g_resl[i]]
    dis = dict(inm=[0], out=[d_out[0] // 2 or 1], down=[False],
               resl=[image_size], att=d_att, input_conv=True)
    prev = dis['out'][0]
    for i, m in enumerate(d_out[:-1]):
        dis['inm'] += [prev, m]
        dis['out'] += [m, m]
        dis['down'] += [True, False]
        dis['resl'] += [image_size // 2 ** (i + 1)] * 2
        prev = m
    return gen, dis


class SNDense(nn.Module):
    features: int
    use_sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=nn.initializers.xavier_normal(),
                     dtype=self.dtype)
        if self.use_sn:
            return nn.SpectralNorm(d)(x, update_stats=train)
        return d(x)


class SNConv(nn.Module):
    features: int
    kernel_size: int = 3
    use_sn: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, use_bias=self.use_bias,
                    kernel_init=nn.initializers.xavier_normal(),
                    dtype=self.dtype)
        if self.use_sn:
            return nn.SpectralNorm(c)(x, update_stats=train)
        return c(x)


class ConditionalNorm(nn.Module):
    '''Affine-free norm, then z-conditional gain/bias (reference :35):
    out = norm(x) * (1 - gain(z)) + bias(z). `norm_name` picks bn|in
    (SEBigGAN exposes it, original/SEBigGAN/utils.py:144).'''
    use_sn: bool = True
    norm_name: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        ch = x.shape[-1]
        if self.norm_name == 'bn':
            norm = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                use_bias=False, use_scale=False,
                                dtype=self.dtype)(x)
        else:
            norm = nn.GroupNorm(num_groups=ch, use_bias=False,
                                use_scale=False, dtype=self.dtype)(x)
        gain = SNDense(ch, self.use_sn, dtype=self.dtype)(z, train)
        bias = SNDense(ch, self.use_sn, dtype=self.dtype)(z, train)
        return norm * (1 - gain)[:, None, None, :] + bias[:, None, None, :]


def up2x(x):
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, H * 2, W * 2, C), method='nearest')


class GBlock(nn.Module):
    features: int
    upsample: bool = True
    use_sn: bool = True
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        from animeface_tpu.nnutils.module import get_activation
        act = get_activation(self.act_name)
        in_ch = x.shape[-1]
        h = ConditionalNorm(self.use_sn, self.norm_name, self.dtype)(
            x, z, train)
        h = act(h)
        if self.upsample:
            h = up2x(h)
            x = up2x(x)
        if self.upsample or in_ch != self.features:
            x = SNConv(self.features, 1, self.use_sn, dtype=self.dtype)(x, train)
        h = SNConv(self.features, 3, self.use_sn, dtype=self.dtype)(h, train)
        h = ConditionalNorm(self.use_sn, self.norm_name, self.dtype)(
            h, z, train)
        h = act(h)
        h = SNConv(self.features, 3, self.use_sn, dtype=self.dtype)(h, train)
        return h + x


class GBlockDeep(nn.Module):
    '''BigGAN-deep G block (reference GBlockdeep :123): bottleneck
    CN-act-1x1 -> CN-act -> channel-drop skip -> up -> 3x3,3x3 (CN-act
    between) -> 1x1 out. Skip path has NO conv — channels are sliced.'''
    features: int
    upsample: bool = True
    use_sn: bool = True
    channel_ratio: int = 4
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        from animeface_tpu.nnutils.module import get_activation
        act = get_activation(self.act_name)
        cn = lambda h: ConditionalNorm(self.use_sn, self.norm_name,
                                       self.dtype)
        in_ch = x.shape[-1]
        mid = in_ch // self.channel_ratio
        h = cn(x)(x, z, train)
        h = act(h)
        h = SNConv(mid, 1, self.use_sn, dtype=self.dtype)(h, train)
        h = cn(h)(h, z, train)
        h = act(h)
        if in_ch != self.features:       # drop_channel (ref :160-161)
            x = x[..., :self.features]
        if self.upsample:
            h = up2x(h)
            x = up2x(x)
        h = SNConv(mid, 3, self.use_sn, dtype=self.dtype)(h, train)
        h = cn(h)(h, z, train)
        h = act(h)
        h = SNConv(mid, 3, self.use_sn, dtype=self.dtype)(h, train)
        h = cn(h)(h, z, train)
        h = act(h)
        h = SNConv(self.features, 1, self.use_sn, dtype=self.dtype)(h, train)
        return h + x


class DBlock(nn.Module):
    features: int
    downsample: bool = True
    use_sn: bool = True
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from animeface_tpu.nnutils.module import get_activation
        act = get_activation(self.act_name)
        in_ch = x.shape[-1]
        h = act(x)
        h = SNConv(self.features, 3, self.use_sn, dtype=self.dtype)(h, train)
        h = act(h)
        h = SNConv(self.features, 3, self.use_sn, dtype=self.dtype)(h, train)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if in_ch != self.features:
            x = SNConv(self.features, 1, self.use_sn, dtype=self.dtype)(x, train)
        return h + x


class DBlockDeep(nn.Module):
    '''BigGAN-deep D block (reference DBlockdeep :211): bottleneck
    act-1x1 -> act-3x3 -> act-3x3 -> act -> down -> 1x1 out; skip widens by
    CONCATENATING a 1x1 conv of the input (in -> out-in channels).'''
    features: int
    downsample: bool = True
    use_sn: bool = True
    channel_ratio: int = 4
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from animeface_tpu.nnutils.module import get_activation
        act = get_activation(self.act_name)
        in_ch = x.shape[-1]
        mid = self.features // self.channel_ratio
        h = act(x)
        h = SNConv(mid, 1, self.use_sn, dtype=self.dtype)(h, train)
        h = act(h)
        h = SNConv(mid, 3, self.use_sn, dtype=self.dtype)(h, train)
        h = act(h)
        h = SNConv(mid, 3, self.use_sn, dtype=self.dtype)(h, train)
        h = act(h)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = SNConv(self.features, 1, self.use_sn, dtype=self.dtype)(h, train)
        if in_ch != self.features:
            widen = SNConv(self.features - in_ch, 1, self.use_sn,
                           dtype=self.dtype)(x, train)
            x = jnp.concatenate([x, widen], axis=-1)
        return h + x


class LambdaLayer(nn.Module):
    '''LambdaNetworks content+position lambda (reference LambdaLayer :291;
    experimental self-attention alternative, `att_name='ll'`). Faithful to
    intent; NOTE the reference's own constructor is broken — it applies
    `xavier_normal_` to the 1-D BatchNorm scale vectors (:312-315), which
    raises ValueError in torch, so `att_name='ll'` is unconstructable there.
    We keep the standard ones-init for the norm scales instead.

    The position lambda stores a dense [n, n, keys, u] embedding with
    n = H*W — 268M params at the 64px attention resolution, as designed.'''
    use_sn: bool = True
    keys: int = 16
    heads: int = 4
    u: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, C = x.shape
        n = H * W
        vs = C // self.heads
        q = SNConv(self.keys * self.heads, 1, self.use_sn, False,
                   self.dtype)(x, train)
        k = SNConv(self.keys * self.u, 1, self.use_sn, False,
                   self.dtype)(x, train)
        v = SNConv(vs * self.u, 1, self.use_sn, False, self.dtype)(x, train)
        q = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(q)
        v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(v)

        # channel factorizations mirror the reference's NCHW views (:328-331)
        q = q.reshape(B, n, self.heads, self.keys)
        k = k.reshape(B, n, self.u, self.keys)
        v = v.reshape(B, n, self.u, vs)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(v.dtype)

        lam_c = jnp.einsum('bmuk,bmuv->bkv', k, v)
        y_c = jnp.einsum('bnhk,bkv->bnhv', q, lam_c)
        pos_emb = self.param('pos_emb', nn.initializers.normal(1.0),
                             (n, n, self.keys, self.u))
        lam_p = jnp.einsum('nmku,bmuv->bnkv', pos_emb.astype(v.dtype), v)
        y_p = jnp.einsum('bnhk,bnkv->bnhv', q, lam_p)
        return (y_c + y_p).reshape(B, H, W, self.heads * vs)


class SqueezeExcitation(nn.Module):
    '''SE channel gating (SEBigGAN's NonLocal 'se', reference
    original/SEBigGAN/model.py:350): pool -> fc/16 -> relu -> fc -> sigmoid,
    SN'd bias-free linears.'''
    use_sn: bool = True
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = SNDense(max(1, C // self.reduction), self.use_sn, False,
                    self.dtype)(s, train)
        s = jax.nn.relu(s)
        s = SNDense(C, self.use_sn, False, self.dtype)(s, train)
        s = jax.nn.sigmoid(s.astype(jnp.float32))
        return x * s[:, None, None, :].astype(x.dtype)


def make_attention(att_name: str, use_sn: bool, dtype):
    '''reference Attention() dispatch :345 (+ SEBigGAN's 'se' NonLocal,
    original/SEBigGAN/model.py:371).'''
    assert att_name in ('sa', 'll', 'se'), att_name
    if att_name == 'll':
        return LambdaLayer(use_sn, dtype=dtype)
    if att_name == 'se':
        return SqueezeExcitation(use_sn, dtype=dtype)
    return SelfAttention(use_sn, dtype=dtype)


class SelfAttention(nn.Module):
    '''SAGAN non-local block with pooled keys/values (reference :259).'''
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, C = x.shape
        theta = SNConv(C // 8, 1, self.use_sn, False, self.dtype)(x, train)
        phi = SNConv(C // 8, 1, self.use_sn, False, self.dtype)(x, train)
        g = SNConv(C // 2, 1, self.use_sn, False, self.dtype)(x, train)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.max_pool(g, (2, 2), strides=(2, 2))

        theta = theta.reshape(B, H * W, C // 8)
        phi = phi.reshape(B, H * W // 4, C // 8)
        g = g.reshape(B, H * W // 4, C // 2)
        beta = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', theta, phi,
                       preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum('bqk,bkc->bqc', beta.astype(g.dtype), g)
        out = out.reshape(B, H, W, C // 2)
        out = SNConv(C, 1, self.use_sn, False, self.dtype)(out, train)
        gamma = self.param('gamma', nn.initializers.zeros_init(), (1,))
        return gamma.astype(x.dtype) * out + x


class Generator(nn.Module):
    image_size: int = 128
    z_dim: int = 120
    channels: int = 64
    deep: bool = False
    use_sn: bool = True
    use_attention: bool = True
    att_name: str = 'sa'
    norm_name: str = 'bn'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        from animeface_tpu.nnutils.module import get_activation
        act = get_activation(self.act_name)
        gen, _ = _arch(self.image_size, self.deep)
        ch = self.channels
        x = SNDense(4 * 4 * gen['inm'][0] * ch, self.use_sn,
                    dtype=self.dtype)(z.astype(self.dtype), train)
        x = x.reshape(-1, 4, 4, gen['inm'][0] * ch)
        att_done = not self.use_attention
        for out_mul, up, resl in zip(gen['out'], gen['up'], gen['resl']):
            block = GBlockDeep if self.deep else GBlock
            x = block(out_mul * ch, up, self.use_sn,
                      norm_name=self.norm_name, act_name=self.act_name,
                      dtype=self.dtype)(x, z, train)
            if resl == gen['att'] and not att_done:
                att_done = True
                x = make_attention(self.att_name, self.use_sn,
                                   self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = act(x)
        x = SNConv(3, 3, self.use_sn, dtype=self.dtype)(x, train)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    image_size: int = 128
    channels: int = 64
    deep: bool = False
    use_sn: bool = True
    use_attention: bool = True
    att_name: str = 'sa'
    act_name: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from animeface_tpu.nnutils.module import get_activation
        act = get_activation(self.act_name)
        _, dis = _arch(self.image_size, self.deep)
        ch = self.channels
        x = x.astype(self.dtype)
        att_done = not self.use_attention
        n_blocks = len(dis['out'])
        for i, (out_mul, down, resl) in enumerate(
                zip(dis['out'], dis['down'], dis['resl'])):
            if i == 0 and dis['input_conv']:
                # deep D enters through a plain 3x3 conv (ref :529-532)
                x = SNConv(out_mul * ch, 3, self.use_sn,
                           dtype=self.dtype)(x, train)
            else:
                block = DBlockDeep if self.deep else DBlock
                x = block(out_mul * ch, down, self.use_sn,
                          act_name=self.act_name, dtype=self.dtype)(x, train)
            # attention after the LAST block at the attention resl (ref :539)
            nxt = dis['resl'][i + 1] if i + 1 < n_blocks else -1
            if resl == dis['att'] and nxt != dis['att'] and not att_done:
                att_done = True
                x = make_attention(self.att_name, self.use_sn,
                                   self.dtype)(x, train)
        x = act(x)
        x = jnp.sum(x, axis=(1, 2))    # global sum pool
        x = SNDense(1, self.use_sn, dtype=self.dtype)(x, train)
        return x.astype(jnp.float32)
