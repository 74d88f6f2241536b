'''Benchmark: StyleGAN2-ADA 256px training throughput on the local accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload (the honest north-star one, BASELINE.md): the full StyleGAN2-ADA
training cadence —
  * AugmentPipe (18-knob ADA pipeline, reference `thirdparty/ada/augment.py:179`)
    on-device in the D input path of every adversarial step, plus the
    adaptive-p controller update every 4 steps;
  * lazy regularization at its real cadence (reference
    `implementations/StyleGAN2/utils.py:71-79`): R1 every d_k=16 steps,
    path-length every g_k=8 steps (penalty REPLACES the adversarial loss on
    those iters, and the optimizer lr/beta rescale is active);
  * EMA of G every step.
Throughput is amortized over whole 16-step cadence cycles.

The baseline is the BASELINE.json north star: StyleGAN2-ADA 256px on one
A100, estimated at ~430 images/sec/chip from NVIDIA's published
stylegan2-ada sec/kimg tables (the reference repo publishes no numbers).
'''

from __future__ import annotations

import json
import sys
import time

A100_IMAGES_PER_SEC = 430.0


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from animeface_tpu.utils import EasyDict
    from animeface_tpu.nnutils.accelerate import Accelerator
    from animeface_tpu.nnutils import KeyGen
    from animeface_tpu.nnutils.loss import NonSaturatingLoss
    from animeface_tpu.nnutils.ada import make_ada_pipe, ada_init_state
    from animeface_tpu.implementations.StyleGAN2.utils import (
        build_models, build_train_step, make_optimizers,
    )

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    image_size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    d_k, g_k = 16, 8
    requested = steps
    steps = max(d_k, (steps // d_k) * d_k)   # whole cadence cycles only
    if steps != requested:
        print(f'note: steps adjusted {requested} -> {steps} '
              f'(whole {d_k}-step lazy-reg cadence cycles only)',
              file=sys.stderr)

    import os
    # A/B knob for the mapping-network-cost hypothesis (PERF_NOTES): the
    # probe's 4.9 ms "mapping" figure is dispatch-dominated; the honest
    # in-step cost is bounded by benching 2 vs 8 mapping layers.
    map_layers = int(os.environ.get('ANIMEFACE_BENCH_MAP_LAYERS', '8'))
    args = EasyDict(
        image_size=image_size, image_channels=3, style_dim=512, channels=32,
        max_channels=512, block_num_conv=2, map_num_layers=map_layers,
        map_lr=0.01,
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
    # start the controller mid-ramp so the pipe runs with a live p (its
    # compute cost is p-independent — static shapes — but a zero p would
    # look like a cherry-picked workload)
    state['ada']['p'] = jnp.float32(0.2)

    pipe = make_ada_pipe()

    def augment_fn(key, x, st):
        return pipe(key, x, st['ada']['p'])

    # A/B knob bounding the WHOLE AugmentPipe's in-step cost (upper bound
    # for any augment-call-batching lever): identity augment, same cadence
    if os.environ.get('ANIMEFACE_BENCH_NO_AUG', '') == '1':
        def augment_fn(key, x, st):   # noqa: F811
            return x

    loss = NonSaturatingLoss()

    def make_step(do_r1, do_pl):
        return accel.jit_step(build_train_step(
            G, D, g_tx, d_tx, loss, args.policy, args.r1_lambda,
            args.pl_lambda, args.d_k, args.g_k, 0.999, do_r1=do_r1,
            do_pl=do_pl, augment_fn=augment_fn, ada_enabled=True))

    # cadence variants actually hit with d_k=16, g_k=8 (i in 1..16):
    # plain x14, pl-only (i=8), r1+pl (i=16)
    step_plain = make_step(False, False)
    step_pl = make_step(False, True)
    step_r1pl = make_step(True, True)

    def pick(i):
        do_r1 = i % d_k == 0
        do_pl = i % g_k == 0
        if do_r1:
            return step_r1pl
        if do_pl:
            return step_pl
        return step_plain

    state = accel.prepare(state)
    batch = accel.shard_batch(
        jax.random.normal(keys(), (batch_size, image_size, image_size, 3)))

    # warmup / compile all three variants; float() forces a real D2H fetch —
    # on the axon platform block_until_ready returns before execution
    # completes, so synchronization must go through a concrete value.
    for s in (step_plain, step_pl, step_r1pl):
        state, m = s(state, batch)
        float(m['D'])

    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        state, m = pick(i)(state, batch)
    float(m['D'])   # waits for the whole donation chain
    dt = time.perf_counter() - t0

    n_chips = accel.num_devices
    imgs_per_sec_per_chip = batch_size * steps / dt / n_chips
    print(json.dumps({
        'metric': f'StyleGAN2-ADA {image_size}px train images/sec/chip '
                  f'(batch {batch_size}, AugmentPipe on-device + adaptive p, '
                  f'R1@{d_k} + PL@{g_k} lazy-reg amortized over {steps} steps)',
        'value': round(imgs_per_sec_per_chip, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(imgs_per_sec_per_chip / A100_IMAGES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
