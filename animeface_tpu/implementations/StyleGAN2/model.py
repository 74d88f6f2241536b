'''StyleGAN2 (skip-G / residual-D), TPU-native Flax rebuild of reference
`implementations/StyleGAN2/model.py` (ModulatedConv2d :91, StyleBlock :154,
DBlock :186, MiniBatchStdDev :215, ToImage :239, Mapping :263, Synthesis :285,
Generator :335, Discriminator :370).

TPU-first deviations (semantics preserved, layout/execution changed):
  * NHWC everywhere; weights HWIO.
  * Modulated conv uses the input-scale -> shared-weight conv -> demod-scale
    factorization instead of the reference's batch-grouped conv reshape
    (model.py:118-129): conv(x*s, W)*d == groupconv(x, W*s*d) exactly, but the
    MXU sees ONE large conv with shared weights instead of B tiny groups.
  * Equalized LR is folded into the kernel at apply time (w * gain/sqrt(fan)),
    with kernels stored N(0, 1/lr_mul) — matching init_weight_N01 (:404) +
    ELR (:27) + MapLinear's lr multiplier (:71) composition by construction.
  * Noise injection draws from the module's 'noise' PRNG collection.
'''

from __future__ import annotations

import functools
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.ops import setup_filter, filter2d
from animeface_tpu.ops import upfirdn2d as upfirdn2d_op
from animeface_tpu.parallel import constrain_spatial


def _kernel_init(lr_mul: float = 1.0):
    return nn.initializers.normal(stddev=1.0 / lr_mul)


class ELRDense(nn.Module):
    '''Dense with equalized learning rate (reference ELR :27 + Linear :42).'''
    features: int
    gain: float = 1.0
    lr_mul: float = 1.0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param('kernel', _kernel_init(self.lr_mul),
                            (in_features, self.features))
        coef = self.gain / np.sqrt(in_features)
        y = jnp.dot(x.astype(self.dtype),
                    (kernel * coef).astype(self.dtype))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros_init(),
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y * jnp.asarray(self.lr_mul, self.dtype)


class ELRConv(nn.Module):
    '''3x3/1x1 conv with equalized learning rate.'''
    features: int
    kernel_size: int = 3
    gain: float = 1.0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param('kernel', _kernel_init(), (k, k, in_ch, self.features))
        coef = self.gain / np.sqrt(in_ch * k * k)
        pad = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (kernel * coef).astype(self.dtype),
            (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros_init(),
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ModulatedConv(nn.Module):
    '''Style-modulated conv (reference ModulatedConv2d :91), factorized form.'''
    features: int
    kernel_size: int = 3
    demod: bool = True
    gain: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w_style):
        B, H, W, in_ch = x.shape
        k = self.kernel_size
        # affine: style -> per-input-channel scale, init bias at +1 semantics
        s = ELRDense(in_ch, dtype=jnp.float32, name='affine')(
            w_style.astype(jnp.float32)) + 1.0          # [B, in_ch]
        kernel = self.param('kernel', _kernel_init(),
                            (k, k, in_ch, self.features))
        bias = self.param('bias', nn.initializers.zeros_init(), (self.features,))
        coef = self.gain / np.sqrt(in_ch * k * k)
        w = (kernel * coef).astype(jnp.float32)

        if self.demod:
            # d[b,o] = rsqrt(sum_{k,i} (w[k,i,o] * s[b,i])^2 + 1e-4)
            w2 = jnp.sum(w * w, axis=(0, 1))            # [in_ch, out]
            d = jax.lax.rsqrt((s * s) @ w2 + 1e-4)      # [B, out]
        x = x * s[:, None, None, :].astype(x.dtype)
        pad = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.demod:
            y = y * d[:, None, None, :].astype(y.dtype)
        return y + bias.astype(y.dtype)


class InjectNoise(nn.Module):
    '''Per-pixel noise shared across channels (reference InjectNoise :80;
    the reference's scale parameter is dead code — noise is added unscaled).

    Applying without a 'noise' rng collection is the deterministic mode
    (identity): used by the golden weight-parity tests, where both
    frameworks must synthesize noise-free.'''

    @nn.compact
    def __call__(self, x):
        if not self.has_rng('noise'):
            return x
        key = self.make_rng('noise')
        noise = jax.random.normal(key, x.shape[:3] + (1,), x.dtype)
        return x + noise


_BLUR_KERNEL = [[1., 2., 1.], [2., 4., 2.], [1., 2., 1.]]

# bilinear-up2 zero-insert kernel and its composition with the 3x3 blur:
# both stages are LTI after zero-insertion, so upsample+blur collapse into ONE
# 6-tap separable FIR pass — one full-resolution materialization instead of
# three (resize gather, blur, and their backward twins). Interior-exact vs the
# reference composition (verified in tests); only a <=2px border ring differs
# (edge-clamp vs zero-pad).
_BILINEAR_TAPS = np.asarray([1., 3., 3., 1.]) / 4.0
_UPBLUR_TAPS = np.convolve(_BILINEAR_TAPS, np.asarray([1., 2., 1.]) / 4.0)


class Blur2d(nn.Module):
    '''3x3 binomial blur (reference Blur2d :133) via the ops FIR path.'''

    @nn.compact
    def __call__(self, x):
        f = setup_filter(_BLUR_KERNEL)
        return filter2d(x, f)


def upsample2x_bilinear(x):
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, H * 2, W * 2, C), method='bilinear')


def upsample2x_fused(x):
    '''Single-pass bilinear up2 as upfirdn (interior-exact vs jax resize).'''
    f = jnp.asarray(np.outer(_BILINEAR_TAPS, _BILINEAR_TAPS), jnp.float32)
    return upfirdn2d_op(x, f, up=2, padding=[2, 1, 2, 1])


def upblur2x_fused(x):
    '''Fused bilinear-up2 + 3x3 blur as one upfirdn pass.'''
    f = jnp.asarray(np.outer(_UPBLUR_TAPS, _UPBLUR_TAPS), jnp.float32)
    return upfirdn2d_op(x, f, up=2, padding=[3, 2, 3, 2])


def downsample2x_avg(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class StyleBlock(nn.Module):
    '''upsample -> blur -> [modconv -> noise -> lrelu] x num_conv (:154).

    `fused_resample` collapses the upsample+blur pair into one FIR pass
    (HBM-bandwidth win; set False for exact border parity with the reference).
    '''
    features: int
    num_conv: int = 2
    fused_resample: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w_style):
        if self.fused_resample:
            x = upblur2x_fused(x)
        else:
            x = upsample2x_bilinear(x)
            x = Blur2d()(x)
        for i in range(self.num_conv):
            x = ModulatedConv(self.features, 3, dtype=self.dtype)(x, w_style)
            x = InjectNoise()(x)
            x = jax.nn.leaky_relu(x, 0.2)
        # spatial parallelism: pin the block output (and therefore its
        # saved-for-backward copy) to the (data, spatial) sharding — G builds
        # up from a replicated latent, so nothing else H-shards it (identity
        # under pure dp; see parallel.constrain_spatial)
        return constrain_spatial(x)


class ToImage(nn.Module):
    '''1x1 mod-conv (no demod) to RGB with skip accumulation (:239).'''
    image_channels: int = 3
    upsample: bool = True
    fused_resample: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w_style, pre=None):
        x = ModulatedConv(self.image_channels, 1, demod=False,
                          dtype=self.dtype)(x, w_style)
        if pre is not None:
            x = x + pre
        if self.upsample:
            x = (upsample2x_fused(x) if self.fused_resample
                 else upsample2x_bilinear(x))
        return constrain_spatial(x)


class PixelNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        denom = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True)) + 1e-4
        return x / denom


class MiniBatchStdDev(nn.Module):
    '''Cross-sample stddev feature (reference :215): NHWC, single stat channel,
    whole batch as one group when batch is not divisible by group_size.

    Sharding choice (SURVEY §2.5, deliberate): `grouping` picks how samples
    form groups under a data-parallel mesh.
      * 'strided' (default, the reference's torch `reshape(G, -1, ...)`
        semantics): group m = samples {m, m+N/G, ...} of the GLOBAL batch.
        Exact single-device parity; under a sharded batch axis each group
        spans all devices, so GSPMD materializes a cross-device gather on
        the D hot path.
      * 'contiguous': group m = samples {mG..mG+G-1}. Statistically identical
        (sample order is random), and when the per-device batch divides by G
        every group lives on one shard — zero collectives. Use for
        multi-chip training (--mbsd-grouping contiguous).
    '''
    group_size: int = 4
    eps: float = 1e-4
    grouping: str = 'strided'

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        G = self.group_size if N % self.group_size == 0 else N
        y = x.astype(jnp.float32)
        if self.grouping == 'strided':
            y = y.reshape(G, N // G, H, W, C)
            red_axis, rep = 0, lambda s: jnp.tile(s, (G,))
        else:
            y = y.reshape(N // G, G, H, W, C)
            red_axis, rep = 1, lambda s: jnp.repeat(s, G, axis=0)
        y = y - jnp.mean(y, axis=red_axis, keepdims=True)
        y = jnp.sqrt(jnp.mean(y * y, axis=red_axis) + self.eps)  # [N/G,H,W,C]
        y = jnp.mean(y, axis=(1, 2, 3))                     # [N/G]
        y = rep(y)[:, None, None, None]                     # [N,1,1,1]
        y = jnp.broadcast_to(y, (N, H, W, 1)).astype(x.dtype)
        return jnp.concatenate([x, y], axis=-1)


class Mapping(nn.Module):
    '''8-layer z->w mapping with pixel norm and 0.01 lr multiplier (:263).'''
    style_dim: int = 512
    num_layers: int = 8
    normalize: bool = True
    lr: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = z.astype(jnp.float32)
        if self.normalize:
            x = PixelNorm()(x)
        for _ in range(self.num_layers):
            x = ELRDense(self.style_dim, lr_mul=self.lr, dtype=jnp.float32)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        return x


def _g_channel_ladder(image_size: int, channels: int, max_channels: int):
    chans = channels * (2 ** int(np.log2(image_size) - 2))
    ladder = [min(max_channels, chans)]
    resl = 4
    while resl < image_size:
        resl *= 2
        chans //= 2
        ladder.append(min(max_channels, chans))
    return ladder   # e.g. 128px, c=32: [512, 512, 256, 128, 64, 32]


class Synthesis(nn.Module):
    '''Skip-architecture synthesis (:285) with per-layer style selection.'''
    image_size: int = 128
    image_channels: int = 3
    style_dim: int = 512
    channels: int = 32
    max_channels: int = 512
    num_conv: int = 2
    fused_resample: bool = True
    dtype: Any = jnp.float32

    @property
    def num_layers(self):
        return len(_g_channel_ladder(self.image_size, self.channels,
                                     self.max_channels))

    @nn.compact
    def __call__(self, x, styles):
        '''styles: [L, B, style_dim] per-layer w (L == num_layers).'''
        ladder = _g_channel_ladder(self.image_size, self.channels,
                                   self.max_channels)
        x = ModulatedConv(ladder[0], 3, dtype=self.dtype, name='input')(
            x, styles[0])
        pre = ToImage(self.image_channels, upsample=True, dtype=self.dtype,
                      fused_resample=self.fused_resample,
                      name='input_to_image')(x, styles[0])
        image = pre
        for i, ch in enumerate(ladder[1:]):
            last = (i == len(ladder) - 2)
            x = StyleBlock(ch, self.num_conv, dtype=self.dtype,
                           fused_resample=self.fused_resample)(x, styles[i + 1])
            image = ToImage(self.image_channels, upsample=not last,
                            fused_resample=self.fused_resample,
                            dtype=self.dtype)(x, styles[i + 1], pre)
            pre = image
        return jnp.tanh(image.astype(jnp.float32))


class Generator(nn.Module):
    '''Mapping + Synthesis + learned const input (:335).

    __call__(z) -> (image, w); style mixing via z=(z1, z2) with a traced
    `injection` layer index (per-layer jnp.where select replaces the
    reference's python list splice, model.py:313-325).
    '''
    image_size: int = 128
    image_channels: int = 3
    style_dim: int = 512
    channels: int = 32
    max_channels: int = 512
    block_num_conv: int = 2
    map_num_layers: int = 8
    normalize_latent: bool = True
    map_lr: float = 0.01
    # False = exact reference resampling (separate bilinear-up + blur passes)
    # for golden weight parity; True = fused single-FIR (training default)
    fused_resample: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.map = Mapping(self.style_dim, self.map_num_layers,
                           self.normalize_latent, self.map_lr)
        self.synthesis = Synthesis(
            self.image_size, self.image_channels, self.style_dim,
            self.channels, self.max_channels, self.block_num_conv,
            fused_resample=self.fused_resample, dtype=self.dtype)
        self.const = self.param(
            'const', nn.initializers.normal(1.0),
            (1, 4, 4, self.style_dim))

    @property
    def num_layers(self):
        return self.synthesis.num_layers

    def __call__(self, z, injection=None):
        L = self.synthesis.num_layers
        if isinstance(z, (list, tuple)):
            assert len(z) == 2
            w1, w2 = self.map(z[0]), self.map(z[1])
            B = z[0].shape[0]
            if injection is None:
                injection = jax.random.randint(
                    self.make_rng('mixing'), (), 0, L)
            layer_idx = jnp.arange(L)[:, None, None]
            styles = jnp.where(layer_idx < injection, w1[None], w2[None])
            w_out = w1
        else:
            w = self.map(z)
            B = z.shape[0]
            styles = jnp.broadcast_to(w[None], (L,) + w.shape)
            w_out = w
        x = jnp.broadcast_to(self.const, (B,) + self.const.shape[1:])
        image = self.synthesis(x, styles)
        return image, w_out

    def map_w(self, z):
        '''z -> w through the mapping network only.'''
        return self.map(z)

    def synthesize_from_w(self, w):
        '''Synthesis from a [B, style_dim] w (used by the path-length penalty).'''
        L = self.synthesis.num_layers
        styles = jnp.broadcast_to(w[None], (L,) + w.shape)
        x = jnp.broadcast_to(self.const, (w.shape[0],) + self.const.shape[1:])
        return self.synthesis(x, styles)


class DBlock(nn.Module):
    '''Residual D block (:186): convs -> down, skip 1x1 -> down, /sqrt(2).'''
    features: int
    num_conv: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = x
        for _ in range(self.num_conv):
            x = ELRConv(self.features, 3, dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.2)
        t = ELRConv(self.features, 1, dtype=self.dtype)(t)
        x = downsample2x_avg(x)
        t = downsample2x_avg(t)
        return constrain_spatial((x + t) / np.sqrt(2))


class Discriminator(nn.Module):
    '''Residual discriminator (:370).'''
    image_size: int = 128
    image_channels: int = 3
    channels: int = 32
    max_channels: int = 512
    block_num_conv: int = 2
    mbsd_groups: int = 4
    mbsd_grouping: str = 'strided'
    feature_only: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        chans = self.channels
        x = ELRConv(chans, 1, dtype=self.dtype)(x.astype(self.dtype))
        x = jax.nn.leaky_relu(x, 0.2)
        resl = self.image_size
        och = chans
        while resl > 4:
            resl //= 2
            chans *= 2
            och = min(self.max_channels, chans)
            x = DBlock(och, self.block_num_conv, dtype=self.dtype)(x)
        x = MiniBatchStdDev(self.mbsd_groups, grouping=self.mbsd_grouping)(x)
        x = ELRConv(och, 3, dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = ELRDense(och, dtype=self.dtype)(x)
        if self.feature_only:
            # ContraD cuts the reference D here — before the final act +
            # 1-logit linear (reference ContraD utils.py:287-289)
            return x.astype(jnp.float32)
        x = jax.nn.leaky_relu(x, 0.2)
        x = ELRDense(1, dtype=self.dtype)(x)
        return x.astype(jnp.float32)
