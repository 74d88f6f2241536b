'''Bisect the StyleGAN3-256 batch-32 memory=pack remote-compile failure.

AOT-compiles (lower().compile(), no execution) each piece separately:
  fwd        G forward only
  gstep      G forward+backward + adam update
  dstep      D step (no filtered_lrelu inside)
  plain      full adversarial step
  r1         full R1 step
Usage: python scripts/sg3_bisect.py [batch] [piece ...]
'''

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from animeface_tpu.utils import EasyDict
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.implementations.StyleGAN3.utils import (
    build_models, build_train_step, make_optimizers, init_state)


def main():
    argv = sys.argv[1:]
    batch = int(argv[0]) if argv else 32
    pieces = argv[1:] or ['fwd', 'gstep', 'dstep', 'plain', 'r1']
    memory = os.environ.get('SG3_MEMORY', 'pack')
    image_size = 256

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
    state = accel.prepare(state)
    loss = NonSaturatingLoss()

    z = jnp.zeros((batch, args.latent_dim), jnp.float32)
    img = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)

    def report(name, fn, *xs):
        t0 = time.perf_counter()
        try:
            lowered = jax.jit(fn).lower(*xs)
            lowered.compile()
            print(f'{name}: ok ({time.perf_counter() - t0:.0f}s)', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:300]}',
                  flush=True)

    for piece in pieces:
        if piece == 'fwd':
            report('fwd',
                   lambda p, m, zz: G.apply(
                       {'params': p, 'moments': m}, zz, train=True,
                       mutable=['moments']),
                   state['G'], state['G_moments'], z)
        elif piece == 'gstep':
            def g_step(st, zz):
                def lf(p):
                    fake, _ = G.apply(
                        {'params': p, 'moments': st['G_moments']}, zz,
                        train=True, mutable=['moments'])
                    return jnp.mean(jax.nn.softplus(-fake.astype(jnp.float32)))
                l, g = jax.value_and_grad(lf)(st['G'])
                up, opt = g_tx.update(g, st['g_opt'], st['G'])
                return optax.apply_updates(st['G'], up), opt, l
            report('gstep', g_step, state, z)
        elif piece == 'dstep':
            def d_step(st, im):
                def lf(p):
                    out = D.apply({'params': p}, im)
                    return jnp.mean(out.astype(jnp.float32) ** 2)
                l, g = jax.value_and_grad(lf)(st['D'])
                up, opt = d_tx.update(g, st['d_opt'], st['D'])
                return optax.apply_updates(st['D'], up), opt, l
            report('dstep', d_step, state, img)
        elif piece in ('plain', 'r1'):
            step = build_train_step(G, D, g_tx, d_tx, loss, args.policy,
                                    args.gp_lambda, do_r1=piece == 'r1')
            report(piece, step, state, img)


if __name__ == '__main__':
    main()
