'''EigenGAN recipe (reference `implementations/EigenGAN/utils.py`): hinge
loss, every-step R1 when gp_lambda>0 (the reference adds gp to every D step,
utils.py:64-67 — no lazy cadence), DiffAugment on real AND fake (:54-55),
orthogonality regularizer on the subspace bases (:17-25), optional EMA G
(--ema), optional const subspace input (--const_z), xavier init (:197).'''

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
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.initialize import apply_init
from animeface_tpu.nnutils.loss import HingeLoss, r1_regularizer
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def build_train_step(G, D, g_tx, d_tx, loss, gp_lambda, ortho_lambda,
                     policy, use_ema, ema_decay=0.999):
    def train_step(state, real):
        rng, ekey, ar, af, *zkeys = jax.random.split(
            state['rng'], 4 + G.num_layers)
        B = real.shape[0]
        eps = sample_nnoise(ekey, (B, G.in_dim))
        zs = [sample_nnoise(k, (B, G.z_dim)) for k in zkeys[:G.num_layers]]

        fake, g_mut = G.apply(state['G'], eps, zs, train=True,
                              mutable=['batch_stats'])
        real_aug = diff_augment(ar, real, policy)
        fake_aug = diff_augment(af, fake, policy)
        fake_aug_sg = jax.lax.stop_gradient(fake_aug)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params,
                      'batch_stats': state['D'].get('batch_stats', {})}
            real_prob, d_mut = D.apply(d_vars, real_aug, train=True,
                                       mutable=['batch_stats'])
            fake_prob, d_mut = D.apply({'params': d_params, **d_mut},
                                       fake_aug_sg, train=True,
                                       mutable=['batch_stats'])
            adv = loss.d_loss(real_prob, fake_prob)
            if gp_lambda > 0:   # reference: every step, on un-augmented real
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
            fake2_aug = diff_augment(af, fake2, policy)
            fake_prob, _ = D.apply({'params': d_params, **d_mut}, fake2_aug,
                                   train=True, mutable=['batch_stats'])
            adv = loss.g_loss(fake_prob)
            if ortho_lambda > 0:
                adv = adv + orthogonal_regularizer(g_params) * ortho_lambda
            return adv

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        new_state = dict(rng=rng, G={'params': g_params, **g_mut},
                         D={'params': d_params, **d_mut},
                         g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1)
        if use_ema:
            new_state['G_ema'] = update_ema(g_params, state['G_ema'],
                                            ema_decay)
        return new_state, dict(d=jnp.nan_to_num(d_loss),
                               g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size, in_dim=args.eps_dim,
                  z_dim=args.latent_dim, image_channels=args.image_channels,
                  bottom_width=args.bottom_width, channels=args.g_channels,
                  max_channels=args.g_max_channels, sn=not args.g_disable_sn,
                  use_bias=not args.g_disable_bias,
                  norm_name=args.g_norm_name, act_name=args.g_act_name,
                  dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size,
                      image_channels=args.image_channels,
                      bottom_width=args.bottom_width, channels=args.d_channels,
                      max_channels=args.d_max_channels,
                      sn=not args.d_disable_sn,
                      use_bias=not args.d_disable_bias,
                      norm_name=args.d_norm_name, act_name=args.d_act_name,
                      dtype=accel.compute_dtype)

    zs0 = [jnp.zeros((1, args.latent_dim))] * G.num_layers
    g_vars = dict(G.init(keys(), jnp.zeros((1, args.eps_dim)), zs0,
                         train=True))
    d_vars = dict(D.init(
        keys(), jnp.zeros((1, args.image_size, args.image_size,
                           args.image_channels)), train=True))
    g_vars.setdefault('batch_stats', {})
    d_vars.setdefault('batch_stats', {})
    # reference: init().xavier over conv/linear weights (utils.py:197-199);
    # the Subspace U/L/mu parameters are untouched (module-type based there,
    # leaf-name based here)
    g_vars['params'] = apply_init(keys(), g_vars['params'], 'xavier')
    d_vars['params'] = apply_init(keys(), d_vars['params'], 'xavier')

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))
    if args.ema:
        state['G_ema'] = jax.tree_util.tree_map(jnp.copy, g_vars['params'])

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, HingeLoss(), args.gp_lambda, args.ortho_lambda,
        args.policy, args.ema))

    const_eps = sample_nnoise(keys(), (args.num_test, args.eps_dim))
    const_zs = [sample_nnoise(keys(), (args.num_test, args.latent_dim))
                for _ in range(G.num_layers)] if args.const_z else None
    sample_keys = KeyGen(args.seed + 1)

    @jax.jit
    def _gen(state, zs):
        params = state['G_ema'] if args.ema else state['G']['params']
        return G.apply({'params': params,
                        'batch_stats': state['G']['batch_stats']},
                       const_eps, zs, train=False)

    def sample_fn(state):
        zs = const_zs if const_zs is not None else [
            sample_nnoise(sample_keys(), (args.num_test, args.latent_dim))
            for _ in range(G.num_layers)]
        return _gen(state, zs)

    return run_training(
        name='EigenGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'] if args.ema
        else s['G']['params'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[16, 'number of const for eval'],
        const_z=[False, 'subspace input will be const'],
        image_channels=[3, 'image channels'],
        eps_dim=[512, 'channels of eps input'],
        latent_dim=[6, 'channels of subspace input'],
        bottom_width=[4, 'bottom width'],
        g_channels=[32, 'channel width multiplier'],
        g_max_channels=[512, 'maximum channel width'],
        g_disable_sn=[False, 'disable spectral norm'],
        g_disable_bias=[False, 'disable bias'],
        g_norm_name=['in', 'normalization layer name'],
        g_act_name=['lrelu', 'activation function name'],
        d_channels=[32, 'channel width multiplier'],
        d_max_channels=[512, 'maximum channel width'],
        d_disable_sn=[False, 'disable spectral norm'],
        d_disable_bias=[False, 'disable bias'],
        d_norm_name=['in', 'normalization layer name'],
        d_act_name=['lrelu', 'activation function name'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        gp_lambda=[0., 'lambda for r1'],
        ortho_lambda=[1., 'lambda for orthogonal regularization'],
        policy=['color,translation', 'policy for diffaugment'],
        ema=[False, 'use EMA'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
