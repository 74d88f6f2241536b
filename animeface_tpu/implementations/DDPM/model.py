'''DDPM (reference `implementations/DDPM/model.py`): cosine-schedule Gaussian
diffusion + time-conditioned UNet with self-attention.

TPU-first: the schedule tables are plain numpy constants baked into the jitted
functions; the T-step ancestral sampler `p_sample_loop` is a single
`lax.scan` (reference: a python loop of T device launches, model.py:123).
'''

from __future__ import annotations

import math
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = np.arange(timesteps + 1, dtype=np.float64)
    alpha = np.cos(((steps / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alpha = alpha / alpha[0]
    betas = 1 - alpha[1:] / alpha[:-1]
    return np.clip(betas, None, 0.999)


def _extract(table, t, ndim):
    return table[t].reshape((-1,) + (1,) * (ndim - 1)).astype(jnp.float32)


class GaussianDiffusion:
    '''Forward/backward diffusion math (reference GaussianDiffusion :41).
    Stateless host object; all tables are numpy -> traced as constants.'''

    def __init__(self, timesteps: int = 1000) -> None:
        self.timesteps = timesteps
        betas = cosine_beta_schedule(timesteps)
        alpha = 1 - betas
        alpha_cumprod = np.cumprod(alpha)
        alpha_cumprod_prev = np.concatenate([[1.0], alpha_cumprod[:-1]])
        posterior_variance = betas * (1 - alpha_cumprod_prev) / (1 - alpha_cumprod)

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        self.beta = f32(betas)
        self.alpha_cumprod = f32(alpha_cumprod)
        self.sqrt_alpha_cumprod = f32(np.sqrt(alpha_cumprod))
        self.sqrt_one_minus_alpha_cumprod = f32(np.sqrt(1 - alpha_cumprod))
        self.sqrt_recip_alpha_cumprod = f32(1 / np.sqrt(alpha_cumprod))
        self.sqrt_recipm1_alpha_cumprod = f32(np.sqrt(1 / alpha_cumprod - 1))
        self.posterior_variance = f32(posterior_variance)
        self.posterior_log_variance_clipped = f32(
            np.log(np.clip(posterior_variance, 1e-20, None)))
        self.posterior_mean_coef1 = f32(
            betas * np.sqrt(alpha_cumprod_prev) / (1 - alpha_cumprod))
        self.posterior_mean_coef2 = f32(
            (1 - alpha_cumprod_prev) * np.sqrt(alpha) / (1 - alpha_cumprod))

    def q_sample(self, key, x_0, t, noise=None):
        if noise is None:
            noise = jax.random.normal(key, x_0.shape)
        x_noisy = (_extract(self.sqrt_alpha_cumprod, t, x_0.ndim) * x_0
                   + _extract(self.sqrt_one_minus_alpha_cumprod, t, x_0.ndim)
                   * noise)
        return x_noisy, noise

    def predict_start_from_noise(self, x_t, t, noise):
        return (_extract(self.sqrt_recip_alpha_cumprod, t, x_t.ndim) * x_t
                - _extract(self.sqrt_recipm1_alpha_cumprod, t, x_t.ndim) * noise)

    def q_posterior(self, x_0, x_t, t):
        mean = (_extract(self.posterior_mean_coef1, t, x_t.ndim) * x_0
                + _extract(self.posterior_mean_coef2, t, x_t.ndim) * x_t)
        var = _extract(self.posterior_variance, t, x_t.ndim)
        log_var = _extract(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, log_var

    def p_mean_variance(self, model_fn, x, t, clip_denoised=True):
        x_recon = self.predict_start_from_noise(x, t, model_fn(x, t))
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        return self.q_posterior(x_recon, x, t)

    def p_sample(self, key, model_fn, x, t, clip_denoised=True):
        mean, _, log_var = self.p_mean_variance(model_fn, x, t, clip_denoised)
        noise = jax.random.normal(key, x.shape)
        nonzero = (t != 0).astype(jnp.float32).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def p_sample_loop(self, key, model_fn, shape, noise=None):
        '''x_T -> x_0 as one lax.scan over the T reverse steps.'''
        nkey, ikey = jax.random.split(key)
        image = jax.random.normal(ikey, shape) if noise is None else noise

        def body(carry, i):
            img, k = carry
            k, sub = jax.random.split(k)
            t = jnp.full((shape[0],), self.timesteps - 1 - i, jnp.int32)
            img = self.p_sample(sub, model_fn, img, t)
            return (img, k), None

        (image, _), _ = jax.lax.scan(body, (image, nkey),
                                     jnp.arange(self.timesteps))
        return image


# ---------------- UNet ----------------

def _scaled_init(scale=1.0):
    return nn.initializers.variance_scaling(scale, 'fan_avg', 'uniform')


class TimeEmbedding(nn.Module):
    '''Sinusoidal position embedding (reference :286).'''
    dim: int

    @nn.compact
    def __call__(self, t):
        inv_freq = jnp.exp(jnp.arange(0, self.dim, 2, dtype=jnp.float32)
                           * (-math.log(10000) / self.dim))
        sinusoid = t.astype(jnp.float32)[:, None] * inv_freq[None, :]
        return jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1)


def _norm(name, c, affine=True):
    '''Reference get_normalization (model.py:154): gn | in ('bn' would need
    cross-step running stats in a scan-based sampler; unsupported here).'''
    if name == 'gn':
        return nn.GroupNorm(num_groups=min(32, c), use_bias=affine,
                            use_scale=affine)
    if name == 'in':
        return nn.GroupNorm(num_groups=c, use_bias=affine, use_scale=affine)
    raise Exception(f'NORM : {name} (bn unsupported in the TPU port)')


class ResBlock(nn.Module):
    '''norm -> act -> conv, + time (additive or affine), norm -> act ->
    dropout -> conv, skip (reference ResBlock :205-256). `time_affine` makes
    the time projection emit (gamma, beta) modulating an affine-free norm2
    with 1e-10-scaled init (reference :214-220,242-246).'''
    features: int
    time_affine: bool = False
    norm_name: str = 'gn'
    act_name: str = 'swish'
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, train: bool = True):
        act = get_activation(self.act_name)
        h = _norm(self.norm_name, x.shape[-1])(x)
        h = act(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_scaled_init())(h)
        if self.time_affine:
            t = nn.Dense(self.features * 2, dtype=self.dtype,
                         kernel_init=_scaled_init(1e-10))(act(temb))
            gamma, beta = jnp.split(t[:, None, None, :].astype(h.dtype), 2,
                                    axis=-1)
            h = (1 + gamma) * _norm(self.norm_name, self.features,
                                    affine=False)(h) + beta
        else:
            tproj = nn.Dense(self.features, dtype=self.dtype,
                             kernel_init=_scaled_init())(act(temb))
            h = h + tproj[:, None, None, :].astype(h.dtype)
            h = _norm(self.norm_name, self.features)(h)
        h = act(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_scaled_init(1e-10))(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, kernel_init=_scaled_init())(x)
        return h + x


class SelfAttention(nn.Module):
    '''Full spatial self-attention (:257); QKV as one 1x1 conv, MXU einsums.'''
    num_heads: int = 4
    norm_name: str = 'gn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hd = C // self.num_heads
        h = _norm(self.norm_name, C)(x)
        qkv = nn.Conv(C * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=_scaled_init())(h)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum('bqnc,bknc->bnqk', q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(C)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum('bnqk,bknc->bqnc', attn, v)
        out = out.reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype,
                      kernel_init=_scaled_init(1e-10))(out)
        return out + x


class ResSABlock(nn.Module):
    features: int
    use_attn: bool = False
    num_blocks: int = 1
    attn_heads: int = 8
    time_affine: bool = False
    norm_name: str = 'gn'
    act_name: str = 'swish'
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, train: bool = True):
        for _ in range(self.num_blocks):
            x = ResBlock(self.features, self.time_affine, self.norm_name,
                         self.act_name, self.dropout,
                         dtype=self.dtype)(x, temb, train)
        if self.use_attn:
            x = SelfAttention(self.attn_heads, self.norm_name,
                              dtype=self.dtype)(x)
        return x


class UNet(nn.Module):
    '''Time-conditioned UNet (reference UNet :331).'''
    image_size: int = 128
    bottom: int = 16
    in_channels: int = 3
    channels: int = 32
    attn_resls: Sequence[int] = (16,)
    attn_heads: int = 8
    time_affine: bool = False
    dropout: float = 0.0
    num_res: int = 1
    norm_name: str = 'gn'
    act_name: str = 'swish'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, train: bool = True):
        num_sampling = int(math.log2(self.image_size) - math.log2(self.bottom))
        ch = self.channels
        act = get_activation(self.act_name)

        temb = TimeEmbedding(ch)(t)
        temb = nn.Dense(ch * 4, dtype=self.dtype, kernel_init=_scaled_init())(temb)
        temb = act(temb)
        temb = nn.Dense(ch * 4, dtype=self.dtype, kernel_init=_scaled_init())(temb)

        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_scaled_init())(x.astype(self.dtype))

        skips = []
        resl = self.image_size
        c = ch
        for i in range(num_sampling):
            resl //= 2
            c *= 2
            h = ResSABlock(c, resl in self.attn_resls, self.num_res,
                           self.attn_heads, self.time_affine, self.norm_name,
                           self.act_name, self.dropout,
                           dtype=self.dtype)(h, temb, train)
            skips.append(h)
            if i != num_sampling - 1:
                h = nn.Conv(c, (3, 3), strides=2, padding=1, dtype=self.dtype,
                            kernel_init=_scaled_init())(h)

        h = ResSABlock(c, True, self.num_res, self.attn_heads,
                       self.time_affine, self.norm_name, self.act_name,
                       self.dropout, dtype=self.dtype)(h, temb, train)
        h = ResSABlock(c, False, self.num_res, self.attn_heads,
                       self.time_affine, self.norm_name, self.act_name,
                       self.dropout, dtype=self.dtype)(h, temb, train)

        for i in range(num_sampling):
            resl *= 2
            c //= 2
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = ResSABlock(c, resl in self.attn_resls, self.num_res,
                           self.attn_heads, self.time_affine, self.norm_name,
                           self.act_name, self.dropout,
                           dtype=self.dtype)(h, temb, train)
            if i != num_sampling - 1:
                N, H, W, C = h.shape
                h = jax.image.resize(h, (N, H * 2, W * 2, C), method='bilinear')
                h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                            kernel_init=_scaled_init())(h)

        h = _norm(self.norm_name, h.shape[-1])(h)
        h = act(h)
        h = nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_scaled_init(1e-10))(h)
        return h.astype(jnp.float32)
