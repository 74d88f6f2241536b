'''StyleGAN3-T 256px train-step throughput probe (one chip).

Usage: python scripts/sg3_probe.py [batch ...] [--memory store|pack]

Measures the full recipe cadence (DiffAugment color,translation + additive
R1@16) amortized over 16-step cycles, like the reference workload
(`/root/reference/implementations/StyleGAN3/utils.py`). Round-2 baseline:
memory='store' OOMs at batch 32 (166M over HBM); batch 16 ran 23.5 img/s.
'''

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from animeface_tpu.utils import EasyDict
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.implementations.StyleGAN3.utils import (
    build_models, build_train_step, make_optimizers, init_state)


def run(batch_size, memory, steps=32, image_size=256, remat='none'):
    args = EasyDict(
        image_size=image_size, image_channels=3, latent_dim=512, style_dim=512,
        num_layers=14, map_num_layers=2, channels=32, max_channels=512,
        no_pixel_norm=False, d_channels=32, d_max_channels=512,
        mbsd_group_size=4, mbsd_channels=1, bottom=4, lr=0.0025,
        map_lr_scale=0.01, betas=[0., 0.99], gp_lambda=3., gp_every=16,
        policy='color,translation', mesh=[-1], no_bf16=False, seed=0,
    )
    accel = Accelerator(mesh_shape=(-1,), bf16=True)
    keys = KeyGen(0)

    G, D = build_models(args, accel.compute_dtype)
    G = G.clone(flrelu_memory=memory)
    g_tx, d_tx = make_optimizers(args)
    state, _ = init_state(args, G, D, g_tx, d_tx, keys)

    loss = NonSaturatingLoss()
    remat_d = 'd' in remat.split('+')
    remat_r1 = 'r1' in remat.split('+')
    jit_plain = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda, do_r1=False,
        remat_d=remat_d))
    jit_r1 = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda, do_r1=True,
        remat_d=remat_d, remat_r1=remat_r1))

    state = accel.prepare(state)
    batch = accel.shard_batch(
        jax.random.normal(keys(), (batch_size, image_size, image_size, 3)))

    for s in (jit_plain, jit_r1):
        state, m = s(state, batch)
        float(m['d'])

    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        s = jit_r1 if i % args.gp_every == 0 else jit_plain
        state, m = s(state, batch)
    float(m['d'])
    dt = time.perf_counter() - t0
    ips = batch_size * steps / dt / accel.num_devices
    print(f'batch={batch_size} memory={memory} remat={remat}: '
          f'{ips:.1f} img/s/chip ({dt / steps * 1e3:.0f} ms/step)',
          flush=True)
    return ips


if __name__ == '__main__':
    argv = sys.argv[1:]
    memory = 'pack'
    remat = 'none'
    if '--memory' in argv:
        i = argv.index('--memory')
        memory = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if '--remat' in argv:
        i = argv.index('--remat')
        remat = argv[i + 1]   # none | d | r1 | d+r1 (flrelu via --memory remat)
        argv = argv[:i] + argv[i + 2:]
    batches = [int(a) for a in argv] or [16, 32, 64]
    for b in batches:
        try:
            run(b, memory, remat=remat)
        except Exception as e:  # noqa: BLE001 - report OOM per batch size
            print(f'batch={b} memory={memory} remat={remat}: FAILED '
                  f'{type(e).__name__}: {str(e)[:300]}', flush=True)
