'''Bilinear grid sampling, differentiable to arbitrary order.

Rebuild of reference `thirdparty/stylegan3_ops/ops/grid_sample_gradfix.py:21`
(which existed only to give torch's grid_sample a double-backward). In JAX a
gather-based bilinear sample is natively arbitrary-order differentiable, so
this is simply the op itself. Matches torch.nn.functional.grid_sample with
mode='bilinear', padding_mode='zeros', align_corners=False.

NHWC: x [N,H,W,C], grid [N,Ho,Wo,2] with (x, y) in [-1, 1].
'''

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(x, grid):
    N, H, W, C = x.shape
    gx = (grid[..., 0].astype(jnp.float32) + 1.0) * (W * 0.5) - 0.5
    gy = (grid[..., 1].astype(jnp.float32) + 1.0) * (H * 0.5) - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(ix, iy):
        # zeros padding: out-of-bounds taps contribute 0
        valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        batch = jnp.arange(N)[:, None, None]
        v = x[batch, iyc, ixc]                      # [N,Ho,Wo,C]
        return v * valid[..., None].astype(x.dtype)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = gather(x0i,     y0i)
    v01 = gather(x0i + 1, y0i)
    v10 = gather(x0i,     y0i + 1)
    v11 = gather(x0i + 1, y0i + 1)

    wx = wx[..., None].astype(x.dtype)
    wy = wy[..., None].astype(x.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
