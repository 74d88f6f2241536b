'''PEinGAN recipe (reference `implementations/PEinGAN/utils.py`): multi-scale
training — each step draws a synthesis scale (SPE bottom size) by probability,
reals are resized to the matching resolution; non-saturating + lazy R1,
DiffAugment, EMA. One compiled step per (scale, r1) pair.'''

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.PEinGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss, r1_regularizer
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import build_loader


def build_train_step(G, D, g_tx, d_tx, loss, policy, gp_lambda, bottom,
                     out_size, do_r1, ema_decay=0.999):
    def train_step(state, real):
        rng, zkey, ar, af, nkey = jax.random.split(state['rng'], 5)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.style_dim))
        real = jax.image.resize(real, (B, out_size, out_size, 3),
                                method='bilinear')

        fake, _ = G.apply({'params': state['G']}, z, bottom=bottom,
                          rngs={'noise': nkey})
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            real_prob = D.apply({'params': d_params},
                                diff_augment(ar, real, policy))
            fake_prob = D.apply({'params': d_params},
                                diff_augment(af, fake_sg, policy))
            adv = loss.d_loss(real_prob, fake_prob)
            if do_r1:
                d_apply = lambda img: D.apply({'params': d_params}, img)
                adv = adv + r1_regularizer(real, d_apply) * gp_lambda
            return adv

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params}, z, bottom=bottom,
                               rngs={'noise': nkey})
            fake_prob = D.apply({'params': d_params},
                                diff_augment(af, fake2, policy))
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params,
                    G_ema=update_ema(g_params, state['G_ema'], ema_decay),
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(G=jnp.nan_to_num(g_loss), D=jnp.nan_to_num(d_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size, style_dim=args.style_dim,
                  channels=args.channels, max_channels=args.max_channels,
                  map_num_layers=args.map_num_layers,
                  embed_dim=args.embed_dim, dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size, channels=args.channels,
                      max_channels=args.max_channels,
                      dtype=accel.compute_dtype)

    g_vars = G.init({'params': keys(), 'noise': keys()},
                    jnp.zeros((1, args.style_dim)), bottom=4)
    d_vars = D.init(keys(), jnp.zeros((2, args.image_size, args.image_size, 3)))

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    loss = NonSaturatingLoss()
    mult = args.image_size // 4
    scale_bottoms = [max(2, int(round(4 * s))) for s in args.scales]
    steps = {}

    def get_step(bottom, do_r1):
        key = (bottom, do_r1)
        if key not in steps:
            steps[key] = accel.jit_step(build_train_step(
                G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda,
                bottom, bottom * mult, do_r1))
        return steps[key]

    py_rng = random.Random(args.seed)
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        bottom = py_rng.choices(scale_bottoms,
                                weights=args.scale_probs)[0]
        do_r1 = bool(args.gp_lambda > 0 and i % args.gp_every == 0 and i)
        return get_step(bottom, do_r1)(state, batch)

    const_z = sample_nnoise(keys(), (16, args.style_dim))
    nk = keys()

    @jax.jit
    def sample_fn(state):
        images, _ = G.apply({'params': state['G_ema']}, const_z, bottom=4,
                            rngs={'noise': nk})
        return images

    return run_training(
        name='PEinGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        style_dim=[512, 'style dimension'],
        channels=[32, 'channel width'],
        max_channels=[512, 'max channels'],
        map_num_layers=[8, 'mapping layers'],
        embed_dim=[128, 'SPE embedding dim (per axis, half)'],
        scales=[[1.0, 1.5], 'synthesis scales (xbottom 4)'],
        scale_probs=[[0.7, 0.3], 'probability per scale'],
        lr=[0.001, 'learning rate'],
        betas=[[0., 0.99], 'betas'],
        gp_lambda=[10., 'lambda for r1'],
        gp_every=[16, 'R1 every N steps'],
        policy=['color,translation', 'DiffAugment policy'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
