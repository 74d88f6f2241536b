'''Probe XLA gather formulations for the ADA warp on TPU.'''
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
S = 2 * 256 + 24    # upsampled canvas incl filter pad
OP = 536            # output side

key = jax.random.PRNGKey(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.sum(jnp.asarray(r, jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(*args)
    float(jnp.sum(jnp.asarray(r, jnp.float32)))
    dt = (time.perf_counter() - t0) / 5 * 1000
    print(f'{name:40s} {dt:9.2f} ms')


U32 = jax.random.normal(key, (B, S, S, 3), jnp.float32)
U16 = U32.astype(jnp.bfloat16)
iy = jax.random.randint(key, (B, OP, OP), 0, S - 2)
ix = jax.random.randint(key, (B, OP, OP), 0, S - 2)
batch = jnp.arange(B)[:, None, None]

# 1. plain 4-corner per-pixel gather, f32 (baseline from ada_profile)
def plain(U, iy, ix):
    def corner(dy, dx):
        return U[batch, iy + dy, ix + dx]
    return (corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1)) * 0.25

timeit('4-corner per-pixel f32', plain, U32, iy, ix)
timeit('4-corner per-pixel bf16', plain, U16, iy, ix)

# 2. single-corner (index-count isolation)
def single(U, iy, ix):
    return U[batch, iy, ix]

timeit('1-corner per-pixel f32', single, U32, iy, ix)

# 3. corner-packed canvas: one index -> [2,2,3] patch
def packed(U, iy, ix):
    Up = jnp.stack([U[:, :-1, :-1], U[:, :-1, 1:], U[:, 1:, :-1], U[:, 1:, 1:]],
                   axis=-2)              # [B,S-1,S-1,4,3]
    return jnp.mean(Up[batch, iy, ix], axis=-2)

timeit('corner-packed 1-index f32', packed, U32, iy, ix)

# 4. row gather then column gather (two 1-axis gathers, per-pixel indices)
def two_axis(U, iy, ix):
    rows = jnp.take_along_axis(U, iy[..., None, None], axis=1)  # [B,OP,OP?,3]? shapes differ
    return rows

# skip 4 (shape gymnastics) - probe take_along_axis flat instead
def flat(U, iy, ix):
    V = U.reshape(B, S * S, 3)
    idx = iy * S + ix
    return jnp.take_along_axis(V, idx.reshape(B, -1, 1), axis=1)

timeit('flattened take_along_axis f32', flat, U32, iy, ix)

# 5. whole-ROW gather (index per row, contiguous rows) - the structured case
riy = jax.random.randint(key, (B, OP), 0, S - 1)
def row_gather(U, riy):
    return U[batch[:, :, 0], riy]        # [B, OP, S, 3]

timeit('whole-row gather (per-row idx) f32', row_gather, U32, riy)
timeit('whole-row gather (per-row idx) bf16', row_gather, U16, riy)

# 6. dense radix per-row integer shift along x (11 bits) for comparison
shifts = jax.random.randint(key, (B, OP), 0, 1024)
def radix_shift(U, shifts):
    z = U[:, :OP]                         # [B, OP, S, 3]
    applied = shifts
    for b in range(10):
        m = ((applied >> b) & 1).astype(bool)[:, :, None, None]
        rolled = jnp.roll(z, -(1 << b), axis=2)
        z = jnp.where(m, rolled, z)
    return z

timeit('radix 10-bit per-row x-shift f32', radix_shift, U32, shifts)
timeit('radix 10-bit per-row x-shift bf16', radix_shift, U16, shifts)

# 7. batched 2-tap banded matmul (shared slope resample) per image
Wm = jax.random.normal(key, (B, OP, S), jnp.bfloat16)
def slope_matmul(Wm, U):
    z = U[:, :OP].reshape(B, OP, S, 3).astype(jnp.bfloat16)
    # contract over input width: [B,OP,S] @ [B,rows? ...] do per-row shared:
    # out[b, r, o, c] = sum_s Wm[b, o, s] * z[b, r, s, c]
    return jnp.einsum('bos,brsc->broc', Wm, z,
                      preferred_element_type=jnp.float32)

timeit('shared-slope banded matmul bf16', slope_matmul, Wm, U16)
