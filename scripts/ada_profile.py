'''Profile the ADA AugmentPipe pieces on the local accelerator.'''
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')

from animeface_tpu.nnutils.ada import make_ada_pipe

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
S = int(sys.argv[2]) if len(sys.argv) > 2 else 256
REPS = 10

pipe = make_ada_pipe()
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, S, S, 3), jnp.bfloat16)
p = jnp.float32(0.2)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.sum(jnp.asarray(r, jnp.float32)))   # sync through concrete fetch
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(*args)
    float(jnp.sum(jnp.asarray(r, jnp.float32)))
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f'{name:34s} {dt:9.2f} ms')
    return dt


# full pipe
timeit('full pipe', lambda k, v, q: pipe(k, v, q), key, x, p)

# geometry only
geo = make_ada_pipe(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                    xfrac=1)
timeit('geometry only', lambda k, v, q: geo(k, v, q), key, x, p)

# color only
col = make_ada_pipe(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)
timeit('color only', lambda k, v, q: col(k, v, q), key, x, p)

# canvases only (the 4 upsampled cores)
def canvases(v):
    import jax.numpy as jnp
    from animeface_tpu.ops.upfirdn2d import upfirdn2d
    f = geo.Hz_geom
    taps = int(f.shape[0])
    e = taps // 2
    xe = jnp.pad(v.astype(jnp.float32), ((0, 0), (e, e), (e, e), (0, 0)),
                 mode='reflect')
    p0, p1 = (taps + 1) // 2, (taps - 2) // 2
    up_x = lambda z, fil: upfirdn2d(z, fil[None, :], up=(2, 1),
                                    padding=(p0, p1, 0, 0), gain=2)
    up_y = lambda z, fil: upfirdn2d(z, fil[:, None], up=(1, 2),
                                    padding=(0, 0, p0, p1), gain=2)
    ff = jnp.flip(f)
    ux_n, ux_f = up_x(xe, f), up_x(xe, ff)
    return jnp.stack([up_y(ux_n, f), up_y(ux_f, f),
                      up_y(ux_n, ff), up_y(ux_f, ff)], axis=1)

timeit('4 canvases (upsample convs)', canvases, x)

# gather only: bilinear sample of a [B,4,2S,2S,3] stack at random coords
U = jax.random.normal(key, (B, 4, 2 * S, 2 * S, 3), jnp.float32)
jx = jax.random.uniform(key, (B, 2 * (S + 12), 2 * (S + 12)),
                        minval=0.0, maxval=2 * S - 2.0)
jy = jax.random.uniform(key, (B, 2 * (S + 12), 2 * (S + 12)),
                        minval=0.0, maxval=2 * S - 2.0)

def gather_bilinear(U, jx, jy):
    x0 = jnp.floor(jx); y0 = jnp.floor(jy)
    wx = (jx - x0)[..., None]; wy = (jy - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    batch = jnp.arange(U.shape[0])[:, None, None]
    Sx = U.shape[3]; Sy = U.shape[2]
    def corner(xi, yi):
        c = (xi + yi) % 4   # fake canvas index, same cost shape
        return U[batch, c, jnp.clip(yi, 0, Sy - 1), jnp.clip(xi, 0, Sx - 1)]
    v00 = corner(x0i, y0i); v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1); v11 = corner(x0i + 1, y0i + 1)
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy

timeit('fold-gather bilinear', gather_bilinear, U, jx, jy)

# plain grid_sample-style gather (no canvas dim) for comparison
U1 = jax.random.normal(key, (B, 2 * S, 2 * S, 3), jnp.float32)

def gather_plain(U, jx, jy):
    x0 = jnp.floor(jx); y0 = jnp.floor(jy)
    wx = (jx - x0)[..., None]; wy = (jy - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    batch = jnp.arange(U.shape[0])[:, None, None]
    Sx = U.shape[2]; Sy = U.shape[1]
    def corner(xi, yi):
        return U[batch, jnp.clip(yi, 0, Sy - 1), jnp.clip(xi, 0, Sx - 1)]
    v00 = corner(x0i, y0i); v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1); v11 = corner(x0i + 1, y0i + 1)
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy

timeit('plain bilinear gather', gather_plain, U1, jx, jy)

# imgfilter
flt = make_ada_pipe(imgfilter=1)
timeit('imgfilter only', lambda k, v, q: flt(k, v, q), key, x, p)
