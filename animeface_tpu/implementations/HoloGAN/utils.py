'''HoloGAN recipe (reference `implementations/HoloGAN/utils.py`): random
camera angles per sample, GAN loss + per-block style BCE + z-reconstruction
identity loss on both G and D.'''

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.HoloGAN.model import (
    Generator, Discriminator, rotation_theta,
)
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_unoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import GANLoss
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def sample_angles(key, batch, minmax_deg=(0, 0, 220, 320, 0, 0)):
    r = [math.radians(v) for v in minmax_deg]
    ks = jax.random.split(key, 3)
    ax = sample_unoise(ks[0], (batch,), r[0], r[1] + 1e-8)
    ay = sample_unoise(ks[1], (batch,), r[2], r[3] + 1e-8)
    az = sample_unoise(ks[2], (batch,), r[4], r[5] + 1e-8)
    return jnp.stack([ax, ay, az], axis=-1)


def linspace_angles(num, minmax_deg=(0, 0, 220, 320, 0, 0)):
    '''Reference gen_theta(random=False) (utils.py:53-65): angles swept
    min -> max across the eval batch.'''
    r = [math.radians(v) for v in minmax_deg]
    ax = jnp.linspace(r[0], r[1], num)
    ay = jnp.linspace(r[2], r[3], num)
    az = jnp.linspace(r[4], r[5], num)
    return jnp.stack([ax, ay, az], axis=-1)


def build_train_step(G, D, g_tx, d_tx, loss, policy, style_lambda,
                     identity_lambda):
    def train_step(state, real):
        rng, zkey, akey, augkey = jax.random.split(state['rng'], 4)
        B = real.shape[0]
        z = sample_unoise(zkey, (B, G.noise_channels), -1.0, 1.0)
        theta = rotation_theta(sample_angles(akey, B))

        # reference augments real AND fake before D (utils.py:134,146)
        k1, k2 = jax.random.split(augkey)
        real = diff_augment(k1, real, policy)
        fake = G.apply({'params': state['G']}, z, theta)
        fake = diff_augment(k2, fake, policy)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params,
                      'batch_stats': state['D']['batch_stats']}
            (real_rf, real_styles, _), d_mut = D.apply(
                d_vars, real, train=True, mutable=['batch_stats'])
            (fake_rf, fake_styles, z_rec), d_mut = D.apply(
                {'params': d_params, **d_mut}, fake_sg, train=True,
                mutable=['batch_stats'])
            adv = loss.d_loss(real_rf, fake_rf)
            style = 0.0
            for rs, fs in zip(real_styles, fake_styles):
                style = style + (loss.real_loss(rs) + loss.fake_loss(fs))
            ident = jnp.mean((z_rec - z) ** 2)
            return adv + style * style_lambda + ident * identity_lambda, d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            # reference G phase reuses the SAME augmented fake (utils.py:166)
            # and has NO style term — adv + identity only (utils.py:167-172)
            fake2 = G.apply({'params': g_params}, z, theta)
            fake2 = diff_augment(k2, fake2, policy)
            (fake_rf, _, z_rec), _ = D.apply(
                {'params': d_params, **d_mut}, fake2, train=True,
                mutable=['batch_stats'])
            adv = loss.g_loss(fake_rf)
            ident = jnp.mean((z_rec - z) ** 2)
            return adv + ident * identity_lambda

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D={'params': d_params, **d_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(channels=args.g_channels, noise_channels=args.latent_dim,
                  image_size=args.image_size, activation=args.activation,
                  dtype=accel.compute_dtype)
    D = Discriminator(channels=args.d_channels,
                      noise_channels=args.latent_dim,
                      image_size=args.image_size, activation=args.activation,
                      dtype=accel.compute_dtype)

    z0 = jnp.zeros((2, args.latent_dim))
    theta0 = rotation_theta(jnp.zeros((2, 3)))
    g_vars = G.init(keys(), z0, theta0)
    d_vars = D.init(keys(), jnp.zeros((2, args.image_size, args.image_size, 3)),
                    train=True)
    if 'batch_stats' not in d_vars:
        d_vars = {'params': d_vars['params'], 'batch_stats': {}}

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, GANLoss(), args.policy, args.style_lambda,
        args.identity_lambda))

    # reference eval: ONE z repeated, angles swept min->max (utils.py:117-121)
    const_z = jnp.tile(sample_unoise(keys(), (1, args.latent_dim), -1.0, 1.0),
                       (args.eval_size, 1))
    const_theta = rotation_theta(linspace_angles(args.eval_size))

    @jax.jit
    def sample_fn(state):
        return G.apply({'params': state['G']}, const_z, const_theta)

    return run_training(
        name='HoloGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=10,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    # reference add_args schema (utils.py:215-226), verbatim
    parser = add_args(parser, dict(
        g_channels=[512, 'base channel width'],
        d_channels=[64, 'base channel width'],
        latent_dim=[128, 'input latent dimension'],
        activation=['lrelu', 'activation function name'],
        lr=[0.0001, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        policy=['color,translation', 'policy for diffaugment'],
        style_lambda=[1., 'lambda for style loss'],
        identity_lambda=[1., 'lambda for identity loss'],
        eval_size=[10, 'number of samples for eval'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
