'''AdaBelief study (reference `implementations/AdaBelief/utils.py`): the
StyleGAN2 backbone trained with the AdaBelief optimizer (variance of the
gradient-prediction error; reference vendors `thirdparty/adabelief/
AdaBelief.py:8` — here optax.adabelief provides the same update rule with
rectification). Non-saturating + lazy R1.'''

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.StyleGAN2.utils import (
    STYLEGAN2_ARGS, build_models, build_train_step,
)
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import build_loader
from animeface_tpu.implementations.StyleGAN2.model import Generator


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G, D = build_models(args, accel.compute_dtype)
    z0 = jnp.zeros((1, args.style_dim))
    g_vars = G.init({'params': keys(), 'noise': keys(), 'mixing': keys()}, z0)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size,
                                       args.image_channels)))
    g_params, d_params = g_vars['params'], d_vars['params']

    g_tx = optax.adabelief(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adabelief(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(
        rng=keys(), G=g_params, D=d_params,
        G_ema=jax.tree_util.tree_map(jnp.copy, g_params),
        g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
        pl_mean=jnp.float32(0.0), step=jnp.int32(0),
    )

    loss = NonSaturatingLoss()
    step_builder = functools.lru_cache(maxsize=4)(
        lambda do_r1, do_pl: accel.jit_step(build_train_step(
            G, D, g_tx, d_tx, loss, args.policy, args.r1_lambda,
            args.pl_lambda, args.d_k, args.g_k, 0.999, do_r1, do_pl)))
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        do_r1 = bool(args.r1_lambda > 0 and i % args.d_k == 0 and i != 0)
        do_pl = bool(args.pl_lambda > 0 and i % args.g_k == 0 and i != 0)
        return step_builder(do_r1, do_pl)(state, batch)

    const_z = sample_nnoise(keys(), (16, args.style_dim))
    nk = keys()

    @jax.jit
    def sample_fn(state):
        images, _ = G.apply({'params': state['G_ema']}, const_z,
                            rngs={'noise': nk})
        return images

    return run_training(
        name='AdaBelief', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    args_spec = dict(STYLEGAN2_ARGS)
    args_spec['betas'] = [[0.5, 0.999], 'betas for AdaBelief']
    args_spec.pop('beta1')
    args_spec.pop('beta2')
    parser = add_args(parser, args_spec)
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
