'''FastGAN training recipe (reference `implementations/FastGAN/utils.py`):
hinge loss + D reconstruction loss, DiffAugment on both real and fake,
optional EMA of G; recon grids saved alongside samples.'''

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.FastGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid, save_image
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import HingeLoss
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def build_train_step(G, D, g_tx, d_tx, loss, policy, use_ema):

    def train_step(state, real):
        rng, zkey, ar, af, ag, pk1, pk2, pk3 = jax.random.split(state['rng'], 8)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.latent_dim))

        fake, g_mut = G.apply(state['G'], z, train=True,
                              mutable=['batch_stats'])
        fake_sg = jax.lax.stop_gradient(fake)

        real_aug = diff_augment(ar, real, policy)
        fake_aug = diff_augment(af, fake_sg, policy)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params, 'batch_stats': state['D']['batch_stats']}
            (real_prob, recon_loss, recons), d_mut = D.apply(
                d_vars, real_aug, part_key=pk1, train=True,
                mutable=['batch_stats'])
            (fake_prob, _, _), d_mut = D.apply(
                {'params': d_params, **d_mut}, fake_aug, part_key=pk2,
                train=True, mutable=['batch_stats'])
            adv = loss.d_loss(real_prob, fake_prob)
            return adv + recon_loss, (d_mut, recons)

        (d_loss, (d_mut, recons)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params, **g_mut}, z, train=True,
                               mutable=['batch_stats'])
            fake2_aug = diff_augment(ag, fake2, policy)
            (fake_prob, _, _), _ = D.apply(
                {'params': d_params, **d_mut}, fake2_aug, part_key=pk3,
                train=True, mutable=['batch_stats'])
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        new_G = {'params': g_params, **g_mut}
        if use_ema:
            # copy_buffers=True semantics: params EMA'd, batch stats copied
            ema = {'params': update_ema(g_params, state['G_ema']['params']),
                   'batch_stats': g_mut['batch_stats']}
        else:
            ema = state['G_ema']

        return dict(rng=rng, G=new_G, D={'params': d_params, **d_mut},
                    G_ema=ema, g_opt=g_opt, d_opt=d_opt,
                    step=state['step'] + 1), \
            dict(G=g_loss, D=d_loss), recons

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(latent_dim=args.latent_dim, image_size=args.image_size,
                  channels=args.g_channels, max_channels=args.g_max_channels,
                  interp_size=args.interp_size,
                  image_channels=args.image_channels, bottom=args.g_bottom,
                  norm_name=args.norm_name, transposed=args.transposed,
                  num_sle=args.num_sle, dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size,
                      init_down_size=min(args.init_down_size, args.image_size),
                      image_channels=args.image_channels,
                      channels=args.d_channels,
                      max_channels=args.d_max_channels,
                      norm_name=args.norm_name, bottom=args.d_bottom,
                      decoder_image_size=min(args.decoder_image_size,
                                             args.image_size),
                      dtype=accel.compute_dtype)

    g_vars = G.init({'params': keys()}, jnp.zeros((1, args.latent_dim)),
                    train=True)
    d_vars = D.init({'params': keys(), 'part': keys()},
                    jnp.zeros((2, args.image_size, args.image_size,
                               args.image_channels)), train=True)

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    loss = HingeLoss()
    raw_step = build_train_step(G, D, g_tx, d_tx, loss, args.policy, args.ema)
    jit_step = accel.jit_step(raw_step)
    out_dir = result_dir('FastGAN')
    save_every = args.save
    step_count = {'i': 0}

    def train_step(state, batch):
        state, metrics, recons = jit_step(state, batch)
        step_count['i'] += 1
        if step_count['i'] % save_every == 0:
            grid = make_image_grid(*[np.asarray(r) for r in recons])
            save_image(grid, os.path.join(out_dir, 'recon.jpg'), nrow=8)
        return state, metrics

    const_z = sample_nnoise(keys(), (args.num_test, args.latent_dim))

    @jax.jit
    def sample_fn(state):
        src = state['G_ema'] if args.ema else state['G']
        return G.apply(src, const_z, train=False)

    return run_training(
        name='FastGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'] if args.ema else s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[16, 'number of test images'],
        image_channels=[3, 'image channels'],
        latent_dim=[128, 'dimension for input latent'],
        g_channels=[32, 'G minimum channel width'],
        g_max_channels=[512, 'G maximum channel width'],
        interp_size=[4, 'SLE squeeze size'],
        g_bottom=[4, 'G bottom resolution'],
        norm_name=['bn', 'normlization name'],
        transposed=[False, 'use ConvTransposed2d instead of Upsample'],
        num_sle=[int, 'number of sle blocks'],
        d_channels=[32, 'D minimum channel width'],
        d_max_channels=[512, 'D maximum channel width'],
        d_bottom=[8, 'D bottom resolution'],
        init_down_size=[256, 'resolution after initial downsampling'],
        decoder_image_size=[128, 'decoder target resolution'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        policy=['color,translation', 'policy for diffaugment'],
        ema=[False, 'moving average of G'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
