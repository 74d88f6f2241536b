'''filtered_lrelu kernel-variant bench on the local chip.

Usage: python scripts/flrelu_shift_bench.py [batch] [reps]

Times the XLA composition vs the pallas variants ('shift' round-3 /
'matmul' round-2) at the StyleGAN3-256 layer shapes, scan-chained inside
one jit with a single concrete fetch (the axon tunnel makes individual
dispatches noisy — CLAUDE.md).
'''

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from animeface_tpu.ops.filtered_lrelu import filtered_lrelu
from animeface_tpu.ops import pallas_kernels
from animeface_tpu.ops.upfirdn2d import setup_filter

LAYERS = [(272, 128), (144, 128), (88, 256), (64, 512)]
PAD = 11


def make_fn(kind, fu):
    fu_np = np.asarray(fu)

    def one(x, b):
        if kind == 'xla':
            return filtered_lrelu(x, fu, fu, b, up=2, down=2, padding=PAD,
                                  clamp=256.0, impl='xla')
        out = pallas_kernels.filtered_lrelu_pallas(
            x, fu_np, fu_np, b, 2, 2, (PAD,) * 4, float(np.sqrt(2)), 0.2,
            256.0, False, variant=kind)
        assert out is not None, f'{kind} out of scope'
        return out

    def chained(x, b, n):
        def body(c, _):
            y = one(c, b)
            return (y * jnp.bfloat16(0.5) + x).astype(x.dtype), 0.
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c

    return jax.jit(chained, static_argnums=2)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    fu = setup_filter(np.hanning(12), normalize=True)
    key = jax.random.PRNGKey(0)

    for H, C in LAYERS:
        x = (jax.random.normal(key, (B, H, H, C)) * 0.3).astype(jnp.bfloat16)
        b = (jax.random.normal(key, (C,)) * 0.1).astype(jnp.bfloat16)
        line = [f'{H}^2x{C}:']
        for kind in ('xla', 'gather', 'matmul'):
            try:
                fn = make_fn(kind, fu)
                out = fn(x, b, reps)
                float(jnp.sum(out).astype(jnp.float32))
                t0 = time.perf_counter()
                out = fn(x, b, reps)
                float(jnp.sum(out).astype(jnp.float32))
                dt = (time.perf_counter() - t0) / reps * 1e3
                line.append(f'{kind}={dt:.2f}ms')
            except Exception as e:  # noqa: BLE001 - report per variant
                line.append(f'{kind}=FAILED({type(e).__name__}: {str(e)[:120]})')
        print(' '.join(line), flush=True)


if __name__ == '__main__':
    main()
