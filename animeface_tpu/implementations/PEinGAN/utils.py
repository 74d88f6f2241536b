'''PEinGAN recipe (reference `implementations/PEinGAN/utils.py:19-121,
123-154`): multi-scale training — each step draws a synthesis scale (SPE
bottom size) by probability, reals are resized to the matching resolution;
non-saturating + lazy R1 (every d_k), style mixing with mix_prob,
DiffAugment, EMA. One compiled step per (scale, r1) pair; the mixing
crossover is drawn inside the jitted step.'''

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
                     out_size, do_r1, latent_dim, out_channels,
                     ema_decay=0.999):
    def train_step(state, real):
        rng, zkey, ar, af, nkey, mkey = jax.random.split(state['rng'], 6)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, 2, latent_dim))   # two styles (ref :38)
        real = jax.image.resize(real, (B, out_size, out_size, out_channels),
                                method='bilinear')

        fake, _ = G.apply({'params': state['G']}, z, bottom=bottom,
                          mix_key=mkey, rngs={'noise': nkey})
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
                               mix_key=mkey, rngs={'noise': nkey})
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

    G = Generator(image_size=args.image_size, latent_dim=args.latent_dim,
                  style_dim=args.style_dim, in_channels=args.in_channels,
                  out_channels=args.out_channels, channels=args.g_channels,
                  max_channels=args.g_max_channels,
                  map_num_layers=args.map_num_layers, map_lr=args.map_lr,
                  pixelnorm=not args.no_pixelnorm, use_spe=not args.no_spe,
                  mix_prob=args.mix_prob, dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size, channels=args.d_channels,
                      max_channels=args.d_max_channels,
                      mbsd_groups=args.mbsd_groups, bottom=args.d_bottom,
                      no_gap=args.no_gap, dtype=accel.compute_dtype)

    g_vars = G.init({'params': keys(), 'noise': keys()},
                    jnp.zeros((1, args.latent_dim)), bottom=args.g_bottom)
    d_vars = D.init(keys(), jnp.zeros((2, args.image_size, args.image_size,
                                       args.out_channels)))

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    loss = NonSaturatingLoss()
    mult = args.image_size // args.g_bottom
    scale_bottoms = [max(2, int(round(args.g_bottom * s)))
                     for s in args.scales]
    steps = {}

    def get_step(bottom, do_r1):
        key = (bottom, do_r1)
        if key not in steps:
            steps[key] = accel.jit_step(build_train_step(
                G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda,
                bottom, bottom * mult, do_r1, args.latent_dim,
                args.out_channels))
        return steps[key]

    py_rng = random.Random(args.seed)
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        bottom = py_rng.choices(scale_bottoms,
                                weights=args.scale_probs)[0]
        do_r1 = bool(args.gp_lambda > 0 and i % args.d_k == 0 and i)
        return get_step(bottom, do_r1)(state, batch)

    const_z = sample_nnoise(keys(), (args.num_test, args.latent_dim))
    nk = keys()

    @jax.jit
    def sample_fn(state):
        images, _ = G.apply({'params': state['G_ema']}, const_z,
                            bottom=args.g_bottom, rngs={'noise': nk})
        return images

    return run_training(
        name='PEinGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[16, 'number of test images'],
        no_spe=[False, 'no position encoding'],
        g_bottom=[4, 'bottom width'],
        latent_dim=[512, 'input latent dim'],
        in_channels=[512, 'synthesis input channels'],
        style_dim=[512, 'style code dimension'],
        out_channels=[3, 'output image channels'],
        g_channels=[32, 'channel_width multiplier'],
        g_max_channels=[512, 'maximum channel width'],
        pad=[False, 'use zero padding (fixed: the TPU synthesis is '
                    'SAME-padded; the SPE grid supplies the spatial bias)'],
        map_num_layers=[8, 'number of layers in mapping network'],
        no_pixelnorm=[False, 'disable pixel norm'],
        filter_size=[4, 'size of binomial filter (fixed: shared StyleGAN2 '
                        'blur [1,3,3,1])'],
        g_act_name=['lrelu', 'activation function name (fixed: lrelu)'],
        d_bottom=[2, 'discriminator bottom before GAP'],
        d_channels=[32, 'channel width multiplier'],
        d_max_channels=[512, 'maximum channel width'],
        mbsd_groups=[4, 'mini batch stddev groups'],
        no_gap=[False, 'no gap layer'],
        d_act_name=['lrelu', 'activation function name (fixed: lrelu)'],
        map_lr=[0.01, 'mappinf layer learning rate'],
        lr=[0.001, 'learning rate'],
        betas=[[0., 0.99], 'betas'],
        gp_lambda=[5., 'lambda for r1'],
        d_k=[16, 'calc r1 every'],
        scales=[[1., 1.5, 2.], 'image scales'],
        scale_probs=[[1 / 3, 1 / 3, 1 / 3], 'image scale probability'],
        mix_prob=[0.9, 'style mixing probability'],
        embed_dim=[128, 'SPE embedding dim (per axis, half) — TPU extra'],
        policy=['color,translation'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
