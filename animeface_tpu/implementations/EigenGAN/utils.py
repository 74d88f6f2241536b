'''EigenGAN recipe (reference `implementations/EigenGAN/utils.py`): hinge loss
+ lazy R1 on D, orthogonality regularizer on the subspace bases, EMA G.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.EigenGAN.model import (
    Generator, Discriminator, orthogonal_regularizer,
)
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import HingeLoss, r1_regularizer
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import build_loader


def build_train_step(G, D, g_tx, d_tx, loss, gp_lambda, ortho_lambda,
                     do_r1, ema_decay=0.999):
    def train_step(state, real):
        rng, ekey, *zkeys = jax.random.split(state['rng'], 3 + G.num_layers)
        B = real.shape[0]
        eps = sample_nnoise(ekey, (B, G.in_dim))
        zs = [sample_nnoise(k, (B, G.z_dim)) for k in zkeys[:G.num_layers]]

        fake, g_mut = G.apply(state['G'], eps, zs, train=True,
                              mutable=['batch_stats'])
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params,
                      'batch_stats': state['D'].get('batch_stats', {})}
            real_prob, d_mut = D.apply(d_vars, real, train=True,
                                       mutable=['batch_stats'])
            fake_prob, d_mut = D.apply({'params': d_params, **d_mut}, fake_sg,
                                       train=True, mutable=['batch_stats'])
            adv = loss.d_loss(real_prob, fake_prob)
            if do_r1 and gp_lambda > 0:
                def d_apply(img):
                    out, _ = D.apply({'params': d_params, **d_mut}, img,
                                     train=True, mutable=['batch_stats'])
                    return out
                adv = adv + r1_regularizer(real, d_apply) * gp_lambda
            return adv, d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params, **g_mut}, eps, zs,
                               train=True, mutable=['batch_stats'])
            fake_prob, _ = D.apply({'params': d_params, **d_mut}, fake2,
                                   train=True, mutable=['batch_stats'])
            adv = loss.g_loss(fake_prob)
            if ortho_lambda > 0:
                adv = adv + orthogonal_regularizer(g_params) * ortho_lambda
            return adv

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        ema = update_ema(g_params, state['G_ema'], ema_decay)
        return dict(rng=rng, G={'params': g_params, **g_mut},
                    D={'params': d_params, **d_mut}, G_ema=ema,
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size, in_dim=args.eps_dim,
                  z_dim=args.latent_dim, channels=args.g_channels,
                  max_channels=args.max_channels, dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size, channels=args.d_channels,
                      max_channels=args.max_channels,
                      dtype=accel.compute_dtype)

    zs0 = [jnp.zeros((1, args.latent_dim))] * G.num_layers
    g_vars = G.init(keys(), jnp.zeros((1, args.eps_dim)), zs0, train=True)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size, 3)),
                    train=True)
    g_vars.setdefault('batch_stats', {})
    d_vars.setdefault('batch_stats', {})

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    loss = HingeLoss()
    jit_plain = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, args.gp_lambda, args.ortho_lambda, False))
    jit_r1 = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, args.gp_lambda, args.ortho_lambda, True))
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        if args.gp_lambda > 0 and i % args.gp_every == 0:
            return jit_r1(state, batch)
        return jit_plain(state, batch)

    const_eps = sample_nnoise(keys(), (16, args.eps_dim))
    const_zs = [sample_nnoise(keys(), (16, args.latent_dim))
                for _ in range(G.num_layers)]

    @jax.jit
    def sample_fn(state):
        return G.apply({'params': state['G_ema'],
                        'batch_stats': state['G']['batch_stats']},
                       const_eps, const_zs, train=False)

    return run_training(
        name='EigenGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        eps_dim=[512, 'channels of eps input'],
        latent_dim=[6, 'per-layer subspace dimension'],
        g_channels=[32, 'G channel width'],
        d_channels=[16, 'D channel width'],
        max_channels=[512, 'max channels'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        gp_lambda=[10., 'lambda for r1'],
        gp_every=[16, 'R1 every N steps'],
        ortho_lambda=[1., 'lambda for orthogonal regularization'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
