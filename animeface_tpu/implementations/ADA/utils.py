'''ADA recipe (reference `implementations/ADA/utils.py` + model.py): the
StyleGAN3 backbone with the on-device AugmentPipe replacing DiffAugment, and
the adaptive-p controller (sign of D(real) vs threshold 0.6) updated inside
the jitted step on the global-batch statistic.'''

from __future__ import annotations

import jax
import jax.numpy as jnp

from animeface_tpu.implementations.StyleGAN3.utils import (
    STYLEGAN3_ARGS, build_models, build_train_step, init_state,
    make_optimizers,
)
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.ada import make_ada_pipe, ada_init_state
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import build_loader


def train(args, max_iters, loader, name='ADA'):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G, D = build_models(args, accel.compute_dtype)
    g_tx, d_tx = make_optimizers(args)
    state, _ = init_state(args, G, D, g_tx, d_tx, keys)
    state['ada'] = ada_init_state(args.batch_size, args.ada_interval,
                                  args.ada_target_kimg, args.ada_threshold)

    pipe = make_ada_pipe()

    def augment_fn(key, x, state):
        return pipe(key, x, state['ada']['p'])

    loss = NonSaturatingLoss()
    jit_plain = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, '', args.gp_lambda, do_r1=False,
        augment_fn=augment_fn, ada_enabled=True))
    jit_r1 = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, '', args.gp_lambda, do_r1=True,
        augment_fn=augment_fn, ada_enabled=True))
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        if args.gp_lambda > 0 and i % args.gp_every == 0:
            return jit_r1(state, batch)
        return jit_plain(state, batch)

    const_z = sample_nnoise(keys(), (getattr(args, 'num_test', 16), args.latent_dim))

    @jax.jit
    def sample_fn(state):
        return G.apply({'params': state['G_ema'],
                        'moments': state['G_moments']}, const_z)

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: {'params': s['G_ema'],
                                   'moments': s['G_moments']},
    )


def main(parser):
    parser = add_args(parser, dict(
        **STYLEGAN3_ARGS,
        ada_interval=[4, 'p update interval'],
        ada_target_kimg=[500, 'target kimg for p ramp'],
        ada_threshold=[0.6, 'sign(D(real)) threshold'],
    ))
    args = parser.parse_args()
    # reference ADA/utils.py:131,191: the recipe-level `logfile` IS its
    # Status log file; honor it as an alias of the global --log-file
    if args.logfile and not args.log_file:
        args.log_file = args.logfile
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
