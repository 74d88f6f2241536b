'''End-to-end REAL-input-path throughput (round-4 verdict item 2).

Same workload as bench.py — StyleGAN2-ADA 256px, AugmentPipe on-device,
lazy regularization at the real R1@16/PL@8 cadence — but the batches come
from the REAL input path instead of one resident synthetic batch:

  disk JPEGs -> native C++ batch decode (native/animeface_io.cpp)
             -> threaded DataLoader workers -> prefetch_to_device
             -> sharded jax.Array -> train step

measured over >= 500 steady-state steps, so the number includes every link
the synthetic bench skips (decode, host->device copy, prefetch overlap).
"The loader sustains 1.3x chip consumption in isolation" (PERF_NOTES) and
"the loader overlaps with compute in a real run" are different claims —
this measures the second. The JPEG corpus is manufactured once (307px
sources, quality 92 — the loader_bench.py sizing) under /tmp and reused.

Usage:
    python scripts/real_input_bench.py [batch] [steps] [--device-data]

Prints one JSON line {"metric", "value", "unit", "synthetic_ref", "gap_pct"}.
Reference loader contract being replaced: /root/reference/dataset/_base.py:46.
'''

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = 4096
SRC_SIZE = 307


def ensure_corpus(root: str, n: int) -> list:
    import numpy as np
    from PIL import Image as pilImage
    os.makedirs(root, exist_ok=True)
    paths = [os.path.join(root, f'{i:05d}.jpg') for i in range(n)]
    if all(os.path.exists(p) for p in paths):
        return paths
    rng = np.random.default_rng(0)
    for p in paths:
        if os.path.exists(p):
            continue
        arr = rng.integers(0, 256, size=(SRC_SIZE, SRC_SIZE, 3),
                           dtype=np.uint8)
        pilImage.fromarray(arr).save(p, quality=92)
    return paths


def main():
    argv = [a for a in sys.argv[1:]]
    device_data = '--device-data' in argv
    uint8_transfer = '--uint8-transfer' in argv
    argv = [a for a in argv if not a.startswith('--')]
    batch_size = int(argv[0]) if len(argv) > 0 else 128
    steps = int(argv[1]) if len(argv) > 1 else 512
    image_size = 256
    d_k, g_k = 16, 8
    steps = max(d_k, (steps // d_k) * d_k)

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from animeface_tpu.utils import EasyDict
    from animeface_tpu.nnutils.accelerate import Accelerator
    from animeface_tpu.nnutils import KeyGen
    from animeface_tpu.nnutils.loss import NonSaturatingLoss
    from animeface_tpu.nnutils.ada import make_ada_pipe, ada_init_state
    from animeface_tpu.implementations.StyleGAN2.utils import (
        build_models, build_train_step, make_optimizers)
    from animeface_tpu.dataset._base import Image, make_default_transform

    paths = ensure_corpus('/tmp/animeface_real_bench', N_IMAGES)

    class BenchImages(Image):
        def _load(self):
            return list(paths)

    ds = BenchImages(make_default_transform(image_size))
    assert ds.native_ok(), 'native C++ decode path unavailable — build native/'
    if device_data:
        from animeface_tpu.dataset.device import DeviceDataLoader
        loader = DeviceDataLoader(ds, batch_size, seed=0)
    else:
        from animeface_tpu.dataset._base import DataLoader
        loader = DataLoader(
            ds, batch_size, num_workers=4, seed=0,
            transfer_dtype='uint8' if uint8_transfer else 'float32')

    args = EasyDict(
        image_size=image_size, image_channels=3, style_dim=512, channels=32,
        max_channels=512, block_num_conv=2, map_num_layers=8, map_lr=0.01,
        disable_map_norm=False, mbsd_groups=4, lr=1e-3, beta1=0.0, beta2=0.99,
        g_k=g_k, d_k=d_k, r1_lambda=10.0, pl_lambda=2.0,
        policy='', mesh=[-1], no_bf16=False, seed=0,
    )
    accel = Accelerator(mesh_shape=(-1,), bf16=True)
    keys = KeyGen(0)

    G, D = build_models(args, accel.compute_dtype)
    z0 = jnp.zeros((1, args.style_dim))
    g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()}, z0)
    d_vars = D.init(keys(), jnp.zeros((1, image_size, image_size, 3)))
    g_tx, d_tx = make_optimizers(args)
    state = dict(
        rng=keys(), G=g_vars['params'], D=d_vars['params'],
        G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
        g_opt=g_tx.init(g_vars['params']), d_opt=d_tx.init(d_vars['params']),
        pl_mean=jnp.float32(0.0), step=jnp.int32(0),
        ada=ada_init_state(batch_size, interval=4, target_kimg=500,
                           threshold=0.6),
    )
    state['ada']['p'] = jnp.float32(0.2)
    pipe = make_ada_pipe()

    def augment_fn(key, x, st):
        return pipe(key, x, st['ada']['p'])

    loss = NonSaturatingLoss()

    def make_step(do_r1, do_pl):
        return accel.jit_step(build_train_step(
            G, D, g_tx, d_tx, loss, args.policy, args.r1_lambda,
            args.pl_lambda, args.d_k, args.g_k, 0.999, do_r1=do_r1,
            do_pl=do_pl, augment_fn=augment_fn, ada_enabled=True))

    step_plain = make_step(False, False)
    step_pl = make_step(False, True)
    step_r1pl = make_step(True, True)

    def pick(i):
        if i % d_k == 0:
            return step_r1pl
        if i % g_k == 0:
            return step_pl
        return step_plain

    state = accel.prepare(state)

    def batches():
        '''Infinite epoch cycling with device prefetch — exactly what
        run_training's `for batch in accel.iter_loader(loader)` does, across
        epoch boundaries.'''
        while True:
            yield from accel.iter_loader(loader)

    it = batches()

    # warmup: compile all three cadence variants on REAL batches
    for s in (step_plain, step_pl, step_r1pl):
        state, m = s(state, next(it))
        float(m['D'])

    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        state, m = pick(i)(state, next(it))
    float(m['D'])   # concrete fetch: the only real sync through the tunnel
    dt = time.perf_counter() - t0

    n_chips = accel.num_devices
    ips = batch_size * steps / dt / n_chips
    synthetic_ref = 282.17   # BENCH_r04.json, same workload, resident batch
    print(json.dumps({
        'metric': f'StyleGAN2-ADA {image_size}px REAL-input-path train '
                  f'images/sec/chip (batch {batch_size}, {steps} steps, '
                  + ('device-resident uint8 dataset' if device_data else
                     'native C++ JPEG decode + prefetch'
                     + (' + uint8 wire' if uint8_transfer else ' (f32 wire)'))
                  + ')',
        'value': round(ips, 2),
        'unit': 'images/sec/chip',
        'synthetic_ref': synthetic_ref,
        'gap_pct': round((synthetic_ref - ips) / synthetic_ref * 100, 2),
    }))


if __name__ == '__main__':
    main()
