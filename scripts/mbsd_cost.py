'''MBSD grouping cost under the 8-device mesh (VERDICT r2 item 7).

Measures the StyleGAN2 D forward+backward at 256px / global batch 128 with
`--mbsd-grouping strided` (reference semantics: groups span the global
batch -> cross-device gather) vs `contiguous` (shard-local, collective-free)
on the 8-virtual-device CPU mesh, and reports the collective ops found in
each compiled HLO. Run: `python scripts/mbsd_cost.py [batch] [size]`.

Single-chip TPU runs cannot show the difference (no collectives with one
device); the CPU mesh gives the structural answer — how many collectives
strided inserts and what they cost relative to the D step.
'''

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np

from animeface_tpu.parallel.mesh import make_mesh, shard_batch
from animeface_tpu.implementations.StyleGAN2.model import Discriminator


def collectives(hlo: str):
    return {op: hlo.count(op) for op in
            ('all-gather', 'all-to-all', 'collective-permute', 'all-reduce')
            if op in hlo}


def run(batch=128, size=256, iters=3):
    mesh = make_mesh((8,))
    x = shard_batch(jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, size, size, 3)).astype(np.float32)), mesh)

    results = {}
    for grouping in ('strided', 'contiguous'):
        D = Discriminator(image_size=size, channels=32, max_channels=512,
                          mbsd_groups=4, mbsd_grouping=grouping)
        params = D.init(jax.random.PRNGKey(0), x[:8])['params']

        def loss(p, v):
            return jnp.mean(D.apply({'params': p}, v) ** 2)

        step = jax.jit(jax.grad(loss))
        lowered = step.lower(params, x)
        hlo = lowered.compile().as_text()
        cols = collectives(hlo)

        if iters == 0:                          # compile-only: structure
            results[grouping] = (float('nan'), cols)
            print(f'{grouping:10s}: compile-only   '
                  f'collectives: {cols or "none"}', flush=True)
            continue

        g = step(params, x)                     # compile+warm
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(iters):
            g = step(params, x)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / iters
        results[grouping] = (dt, cols)
        print(f'{grouping:10s}: D fwd+bwd {dt * 1e3:8.1f} ms/step   '
              f'collectives: {cols or "none"}', flush=True)

    s, c = results['strided'][0], results['contiguous'][0]
    if iters:
        print(f'strided / contiguous = {s / c:.4f}x '
              f'({(s - c) * 1e3:+.1f} ms)', flush=True)


if __name__ == '__main__':
    argv = [int(a) for a in sys.argv[1:]]
    run(*argv)
