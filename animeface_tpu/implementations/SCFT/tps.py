'''Thin-plate-spline warping (reference `implementations/SCFT/tps.py`), fully
in-graph: the TPS system for random control-point offsets is a small
(n+3)x(n+3) linear solve per sample (jnp.linalg.solve under vmap), and the
dense flow is applied with the differentiable grid sampler — no host numpy
per step (the reference solves on CPU each call).'''

from __future__ import annotations

import jax
import jax.numpy as jnp

from animeface_tpu.ops import grid_sample


def _u(r2):
    return r2 * 0.5 * jnp.log(r2 + 1e-6)   # r^2 log r = r^2 * log(r2)/2


def tps_grid(key, batch: int, height: int, width: int, grid_points: int = 4,
             std: float = 0.05):
    '''Random TPS sampling grids [B,H,W,2] in [-1,1].'''
    n = grid_points * grid_points
    lin = jnp.linspace(-0.9, 0.9, grid_points)
    cy, cx = jnp.meshgrid(lin, lin, indexing='ij')
    ctrl = jnp.stack([cx.ravel(), cy.ravel()], axis=-1)      # [n,2]

    offsets = jax.random.normal(key, (batch, n, 2)) * std
    target = ctrl[None] + offsets

    # solve TPS mapping source ctrl -> target offsets (per axis)
    d2 = jnp.sum((ctrl[:, None] - ctrl[None, :]) ** 2, -1)
    K = _u(d2)
    P = jnp.concatenate([jnp.ones((n, 1)), ctrl], axis=1)     # [n,3]
    A = jnp.zeros((n + 3, n + 3))
    A = A.at[:n, :n].set(K).at[:n, n:].set(P).at[n:, :n].set(P.T)
    A = A + jnp.eye(n + 3) * 1e-6

    def solve_axis(v):
        rhs = jnp.concatenate([v, jnp.zeros((3,))])
        return jnp.linalg.solve(A, rhs)

    def per_sample(tgt):
        thx = solve_axis(tgt[:, 0] - ctrl[:, 0])
        thy = solve_axis(tgt[:, 1] - ctrl[:, 1])
        return thx, thy

    thx, thy = jax.vmap(per_sample)(target)                   # [B,n+3]

    ys = jnp.linspace(-1, 1, height)
    xs = jnp.linspace(-1, 1, width)
    gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)        # [HW,2]
    d2p = jnp.sum((pts[:, None] - ctrl[None, :]) ** 2, -1)
    U = _u(d2p)                                               # [HW,n]
    Pp = jnp.concatenate([jnp.ones((pts.shape[0], 1)), pts], axis=1)
    basis = jnp.concatenate([U, Pp], axis=1)                  # [HW,n+3]

    dx = basis @ thx.T                                        # [HW,B]
    dy = basis @ thy.T
    gx_w = pts[:, 0][:, None] + dx
    gy_w = pts[:, 1][:, None] + dy
    grid = jnp.stack([gx_w, gy_w], axis=-1)                   # [HW,B,2]
    return grid.transpose(1, 0, 2).reshape(batch, height, width, 2)


def tps_transform(key, x, grid_points: int = 4, std: float = 0.05):
    '''Random TPS warp of an NHWC batch (the reference's spatial_augment).'''
    N, H, W, C = x.shape
    grid = tps_grid(key, N, H, W, grid_points, std)
    return grid_sample(x, grid)
