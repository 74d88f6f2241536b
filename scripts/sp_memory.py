'''Spatial parallelism's value at 512px: compile-time per-device memory
accounting (round-4 verdict item 7; SURVEY §5 long-context analogue).

The claim being demonstrated: once data parallelism hits its floor
(one image per device), the 'spatial' mesh axis is the only axis that keeps
scaling — sharding the image H over it halves per-device activation memory
again, which is what makes >512px synthesis fit at all.

Method: AOT-compile (lower().compile(), no execution) the full StyleGAN2
adversarial train step at 512px with ONE image per device on
  (a) a (4,)    'data'-only mesh            — per-device activations at full H
  (b) a (4, 2)  'data' x 'spatial' mesh     — same per-device batch, H/2 each
and report XLA's CompiledMemoryStats per device. Runs on the virtual 8-CPU
mesh (the same GSPMD partitioning XLA:TPU uses — halo exchanges included);
absolute bytes differ on TPU but the dp-vs-sp RATIO is the compiler's own
buffer-assignment arithmetic, not a simulation.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/sp_memory.py [--image-size 512] [--json out.json]
'''

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp

from animeface_tpu.utils import EasyDict
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.implementations.StyleGAN2.utils import (
    build_models, build_train_step, make_optimizers)


def compile_step(accel, args, batch_size):
    keys = KeyGen(0)
    G, D = build_models(args, accel.compute_dtype)
    z0 = jnp.zeros((1, args.style_dim))
    g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()}, z0)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size, 3)))
    g_tx, d_tx = make_optimizers(args)
    state = dict(
        rng=keys(), G=g_vars['params'], D=d_vars['params'],
        G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
        g_opt=g_tx.init(g_vars['params']), d_opt=d_tx.init(d_vars['params']),
        pl_mean=jnp.float32(0.0), step=jnp.int32(0),
    )
    step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, NonSaturatingLoss(), args.policy,
        args.r1_lambda, args.pl_lambda, args.d_k, args.g_k, 0.999,
        do_r1=False, do_pl=False), donate_state=False)
    state = accel.prepare(state)
    batch = accel.shard_batch(jnp.zeros(
        (batch_size, args.image_size, args.image_size, 3), jnp.float32))
    compiled = step.lower(state, batch).compile()
    return compiled.memory_analysis()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--image-size', type=int, default=512)
    p.add_argument('--json', default=None)
    a = p.parse_args()

    # bf16 compute, trimmed width (1 conv/block) for the 1-core compile
    # budget — activation memory is dominated by the [B,H,W,C] feature maps
    # whose footprint the dp-vs-sp comparison is about; model width scales
    # both sides identically.
    args = EasyDict(
        image_size=a.image_size, image_channels=3, style_dim=64, channels=8,
        max_channels=64, block_num_conv=1, map_num_layers=2, map_lr=0.01,
        disable_map_norm=False, mbsd_groups=2, lr=1e-3, beta1=0.0, beta2=0.99,
        g_k=8, d_k=16, r1_lambda=10.0, pl_lambda=2.0,
        policy='color,translation', no_bf16=False, seed=0,
    )

    devs = jax.devices()
    assert len(devs) >= 8, ('run with XLA_FLAGS='
                            '--xla_force_host_platform_device_count=8')

    # (a) dp floor: 4 devices, one 512px image each
    dp = Accelerator(mesh_shape=(4,), bf16=True, devices=devs[:4])
    # (b) dp x sp: still one image per data group, H split in two — the
    # per-device slice is [1, H/2, W, C]
    sp = Accelerator(mesh_shape=(4, 2), bf16=True, devices=devs[:8],
                     axis_names=('data', 'spatial'))

    print(f'compiling dp (4,) @ {a.image_size}px, batch 4 (1 img/device)...',
          flush=True)
    m_dp = compile_step(dp, args, 4)
    print(f'compiling dp x sp (4, 2) @ {a.image_size}px, batch 4 '
          f'(1 img, H/2 per device)...', flush=True)
    m_sp = compile_step(sp, args, 4)

    rows = {}
    for field in ('temp_size_in_bytes', 'argument_size_in_bytes',
                  'output_size_in_bytes', 'alias_size_in_bytes'):
        d, s = getattr(m_dp, field), getattr(m_sp, field)
        rows[field] = dict(dp=d, dp_x_sp=s,
                           ratio=(d / s if s else float('inf')))
        print(f'{field:28s} dp={d / 2**20:10.1f} MiB   '
              f'dp x sp={s / 2**20:10.1f} MiB   ratio={rows[field]["ratio"]:.2f}x')

    ratio = rows['temp_size_in_bytes']['ratio']
    print(f'\nper-device activation (temp) memory drops {ratio:.2f}x under '
          f'H-sharding at {a.image_size}px with batch pinned at the dp floor '
          f'(1 img/device).')
    if a.json:
        with open(a.json, 'w', encoding='utf-8') as f:
            json.dump(dict(image_size=a.image_size, stats=rows), f, indent=1)
        print(f'wrote {a.json}')


if __name__ == '__main__':
    main()
