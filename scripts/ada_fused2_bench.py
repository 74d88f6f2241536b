'''Measure the fully-fused two-pass ADA warp kernel (ANIMEFACE_ADA_FUSED2)
against the single-pass fused path on the real TPU.

Times twopass_warp fwd and grad at the bench shape (batch 128, 256px) for
both configurations, scan-chained inside one jit to avoid tunnel dispatch
noise. Run twice (env toggles are read at trace time):

    python scripts/ada_fused2_bench.py            # single-pass fused (current default)
    ANIMEFACE_ADA_FUSED2=1 python scripts/ada_fused2_bench.py
'''
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp

from animeface_tpu.nnutils.ada_geometry import twopass_warp, derive_axis_kernel

derive_axis_kernel()   # numpy-side derivation; must run outside any trace

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 256
REPS = 20

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, S, S, 3), jnp.bfloat16)

# representative G_inv batch: small rotations + scales + translations
k1, k2, k3 = jax.random.split(key, 3)
theta = jax.random.uniform(k1, (B,), minval=-0.3, maxval=0.3)
s = jnp.exp(jax.random.normal(k2, (B,)) * 0.1)
t = jax.random.normal(k3, (B, 2)) * 4.0
c, sn = jnp.cos(theta), jnp.sin(theta)
A = jnp.stack([jnp.stack([c * s, -sn * s], -1),
               jnp.stack([sn * s, c * s], -1)], -2)
G_inv = jnp.zeros((B, 3, 3)).at[:, :2, :2].set(A).at[:, :2, 2].set(t)
G_inv = G_inv.at[:, 2, 2].set(1.0)


def chain(fn, n=REPS):
    def body(carry, _):
        out = fn(carry)
        return carry + out[:1, :1, :1, :1] * 1e-9, None
    def run(x0):
        y, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(y.astype(jnp.float32))
    return jax.jit(run)


fwd = chain(lambda v: twopass_warp(v, G_inv))

def gfn(v):
    g = jax.grad(lambda u: jnp.sum(twopass_warp(u, G_inv)
                                   .astype(jnp.float32)))(v)
    return g

bwd = chain(gfn)

mode = 'fused2' if os.environ.get('ANIMEFACE_ADA_FUSED2') else 'single-pass'
for name, f in [('fwd', fwd), ('fwd+grad', bwd)]:
    float(f(x))   # compile + sync (concrete fetch; axon block_until_ready lies)
    t0 = time.perf_counter()
    float(f(x))
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f'{mode:12s} {name:10s} {dt:8.2f} ms/call  (B={B}, {S}px)')
