'''HoloGAN (reference `implementations/HoloGAN/model.py`): 3D-aware generator
— learned voxel constant, AdaIN3d-conditioned 3D up-convs, rigid rotation via
trilinear grid sampling (Transform3d :183), depth-collapse projection, 2D
upsampling; discriminator with per-block style logits and a z-reconstruction
head. Flax; volumes are NDHWC, the trilinear sampler is a jnp gather
(arbitrary-order differentiable).'''

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from animeface_tpu.nnutils.module import get_activation


def _n002():
    return nn.initializers.normal(0.02)


def grid_sample_3d(x, grid):
    '''Trilinear sample, align_corners=True, zeros padding.
    x: [N,D,H,W,C], grid: [N,D,H,W,3] with (x,y,z) in [-1,1] mapping to
    (W,H,D) axes (torch affine_grid convention).'''
    N, D, H, W, C = x.shape
    gx = (grid[..., 0] + 1) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1) * 0.5 * (H - 1)
    gz = (grid[..., 2] + 1) * 0.5 * (D - 1)

    x0, y0, z0 = jnp.floor(gx), jnp.floor(gy), jnp.floor(gz)
    wx, wy, wz = gx - x0, gy - y0, gz - z0

    def gather(ix, iy, iz):
        valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                 & (iz >= 0) & (iz < D))
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        izc = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
        batch = jnp.arange(N).reshape(N, 1, 1, 1)
        v = x[batch, izc, iyc, ixc]
        return v * valid[..., None].astype(x.dtype)

    x0i, y0i, z0i = x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32)
    out = 0.
    for dz, fz in ((0, 1 - wz), (1, wz)):
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                v = gather(x0i + dx, y0i + dy, z0i + dz)
                out = out + v * (fx * fy * fz)[..., None].astype(x.dtype)
    return out


def make_rotation_grid(theta, shape):
    '''theta: [N,3,4] affine; shape: (N,D,H,W,C) -> [N,D,H,W,3] grid
    (align_corners=True linspace over [-1,1]).'''
    N, D, H, W, _ = shape
    zs = jnp.linspace(-1, 1, D)
    ys = jnp.linspace(-1, 1, H)
    xs = jnp.linspace(-1, 1, W)
    gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing='ij')
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, gz, ones], axis=-1)       # [D,H,W,4]
    return jnp.einsum('bij,dhwj->bdhwi', theta, base)   # [N,D,H,W,3]


def rotation_theta(angles):
    '''angles [N,3] (x,y,z radians) -> [N,3,4] rigid rotation affines.'''
    ax, ay, az = angles[:, 0], angles[:, 1], angles[:, 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    N = angles.shape[0]
    Rx = jnp.zeros((N, 3, 3)).at[:, 0, 0].set(1) \
        .at[:, 1, 1].set(cx).at[:, 1, 2].set(-sx) \
        .at[:, 2, 1].set(sx).at[:, 2, 2].set(cx)
    Ry = jnp.zeros((N, 3, 3)).at[:, 1, 1].set(1) \
        .at[:, 0, 0].set(cy).at[:, 0, 2].set(sy) \
        .at[:, 2, 0].set(-sy).at[:, 2, 2].set(cy)
    Rz = jnp.zeros((N, 3, 3)).at[:, 2, 2].set(1) \
        .at[:, 0, 0].set(cz).at[:, 0, 1].set(-sz) \
        .at[:, 1, 0].set(sz).at[:, 1, 1].set(cz)
    R = Rz @ Ry @ Rx
    return jnp.concatenate([R, jnp.zeros((N, 3, 1))], axis=-1)


class AdaIN(nn.Module):
    '''Instance norm (over all spatial dims) + z-conditional scale/bias
    (reference AdaIN3d :36 / AdaIN2d :65).'''
    activation: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, noise):
        C = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        sb = nn.Dense(C * 2, kernel_init=_n002())(
            noise.astype(jnp.float32))
        sb = get_activation(self.activation)(sb)
        scale, bias = jnp.split(sb, 2, axis=-1)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (C,)
        return xn * scale.reshape(shape).astype(x.dtype) \
            + bias.reshape(shape).astype(x.dtype)


def _up3d(x):
    N, D, H, W, C = x.shape
    return jax.image.resize(x, (N, D * 2, H * 2, W * 2, C), method='nearest')


class Generator(nn.Module):
    channels: int = 512
    noise_channels: int = 128
    const_size: int = 4
    image_size: int = 128
    activation: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, theta):
        act = get_activation(self.activation)
        B = z.shape[0]
        c = self.channels
        const = self.param('const_noise', nn.initializers.normal(1.0),
                           (1, self.const_size,) * 1 + (self.const_size,
                                                        self.const_size, c))
        x = jnp.broadcast_to(const, (B,) + const.shape[1:]).astype(self.dtype)
        # two 3D upsample blocks with AdaIN3d
        for _ in range(2):
            c //= 2
            x = _up3d(x)
            x = nn.Conv(c, (3, 3, 3), padding=1, kernel_init=_n002(),
                        dtype=self.dtype)(x)
            x = AdaIN(self.activation, self.dtype)(x, z)
            x = act(x)
        # rigid rotation
        grid = make_rotation_grid(theta, x.shape)
        x = grid_sample_3d(x, grid)
        # 3D convs
        for _ in range(2):
            c //= 2 if _ == 0 else 1
            x = nn.Conv(c, (3, 3, 3), padding=1, kernel_init=_n002(),
                        dtype=self.dtype)(x)
            x = act(x)
        # collapse depth: [B,D,H,W,C] -> [B,H,W,D*C]
        N, D, H, W, C = x.shape
        x = x.transpose(0, 2, 3, 1, 4).reshape(N, H, W, D * C)
        x = nn.Conv((D * C) // 2, (1, 1), kernel_init=_n002(),
                    dtype=self.dtype)(x)
        x = act(x)
        c2 = (D * C) // 2
        num_ups = int(np.log2(self.image_size)
                      - np.log2(self.const_size * 4))
        for _ in range(num_ups):
            c2 //= 2
            N2, H2, W2, C2 = x.shape
            x = jax.image.resize(x, (N2, H2 * 2, W2 * 2, C2), method='nearest')
            x = nn.Conv(c2, (4, 4), padding='SAME', kernel_init=_n002(),
                        dtype=self.dtype)(x)
            x = AdaIN(self.activation, self.dtype)(x, z)
            x = act(x)
        x = nn.Conv(3, (3, 3), padding=1, kernel_init=_n002(),
                    dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    channels: int = 64
    noise_channels: int = 128
    image_size: int = 128
    activation: str = 'lrelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.activation)
        c = self.channels
        conv = nn.SpectralNorm(nn.Conv(c, (5, 5), strides=(2, 2),
                                       padding='SAME',
                                       kernel_init=_n002(),
                                       dtype=self.dtype))
        x = conv(x.astype(self.dtype), update_stats=train)
        x = act(x)
        style_logits = []
        for _ in range(4):
            c *= 2
            conv = nn.SpectralNorm(nn.Conv(c, (5, 5), strides=(2, 2),
                                           padding='SAME',
                                           kernel_init=_n002(),
                                           dtype=self.dtype))
            x = conv(x, update_stats=train)
            x = nn.GroupNorm(num_groups=None, group_size=1,
                             dtype=self.dtype)(x)
            # style statistics logit (reference DBlock2d :196)
            mean = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
            var = jnp.var(x, axis=(1, 2)).astype(jnp.float32)
            style = jnp.concatenate([mean, var], axis=0)
            style_logits.append(nn.Dense(1, kernel_init=_n002())(style))
            x = act(x)
        feat = x.reshape(x.shape[0], -1).astype(jnp.float32)
        rf = nn.Dense(1, kernel_init=_n002())(feat)
        z = nn.Dense(128, kernel_init=_n002())(feat)
        z = get_activation(self.activation)(z)
        z = jnp.tanh(nn.Dense(self.noise_channels, kernel_init=_n002())(z))
        return rf, style_logits, z
