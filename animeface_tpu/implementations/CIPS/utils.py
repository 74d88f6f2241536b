'''CIPS recipe (reference `implementations/CIPS/utils.py`): non-saturating +
lazy R1, DiffAugment, EMA; generator carries a w_avg moments collection.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.CIPS.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss, r1_regularizer
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import (
    run_training, default_max_iters, host_step_counter)
from animeface_tpu.dataset import build_loader


def build_train_step(G, D, g_tx, d_tx, loss, policy, gp_lambda, do_r1,
                     ema_decay=0.999):
    def train_step(state, real):
        rng, zkey, ar, af = jax.random.split(state['rng'], 4)
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.latent_dim))

        fake, g_mut = G.apply(
            {'params': state['G'], 'moments': state['G_moments']}, z,
            train=True, mutable=['moments'])
        fake_sg = jax.lax.stop_gradient(fake)
        real_aug = diff_augment(ar, real, policy)
        fake_aug = diff_augment(af, fake_sg, policy)

        def d_loss_fn(d_params):
            adv = loss.d_loss(D.apply({'params': d_params}, real_aug),
                              D.apply({'params': d_params}, fake_aug))
            if do_r1:
                d_apply = lambda img: D.apply({'params': d_params}, img)
                adv = adv + r1_regularizer(real, d_apply) * gp_lambda
            return adv

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply(
                {'params': g_params, 'moments': state['G_moments']}, z,
                train=True, mutable=['moments'])
            fake_prob = D.apply({'params': d_params},
                                diff_augment(af, fake2, policy))
            return loss.g_loss(fake_prob)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params,
                    G_moments=g_mut['moments'],
                    G_ema=update_ema(g_params, state['G_ema'], ema_decay),
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(g=jnp.nan_to_num(g_loss), d=jnp.nan_to_num(d_loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size, latent_dim=args.latent_dim,
                  style_dim=args.style_dim, num_layers=args.num_layers,
                  channels=args.g_channels, max_channels=args.g_max_channels,
                  image_channels=args.image_channels,
                  map_num_layers=args.map_num_layers,
                  pixel_norm=not args.no_pixel_norm,
                  dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size,
                      in_channels=args.image_channels,
                      channels=args.d_channels,
                      max_channels=args.d_max_channels,
                      mbsd_group_size=args.mbsd_group_size,
                      mbsd_channels=args.mbsd_channels,
                      bottom=args.bottom, filter_size=args.filter_size,
                      dtype=accel.compute_dtype)

    g_vars = G.init(keys(), jnp.zeros((1, args.latent_dim)))
    d_vars = D.init(keys(), jnp.zeros((2, args.image_size, args.image_size,
                                       args.image_channels)))

    # mapping network at lr * map_lr_scale (reference optimizer groups,
    # utils.py:169-173); the mapping Linears are the top-level Linear_* in
    # this flax Generator
    def g_label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: 'map' if str(path[0].key).startswith('Linear_')
            else 'syn', params)

    g_tx = optax.multi_transform(
        {'syn': optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
         'map': optax.adam(args.lr * args.map_lr_scale, b1=args.betas[0],
                           b2=args.betas[1])},
        g_label_fn)
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 G_moments=g_vars['moments'],
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    loss = NonSaturatingLoss()
    jit_plain = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda, False))
    jit_r1 = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, loss, args.policy, args.gp_lambda, True))
    next_index = host_step_counter()

    def train_step(state, batch):
        i = next_index(state)
        if args.gp_lambda > 0 and i % args.gp_every == 0:
            return jit_r1(state, batch)
        return jit_plain(state, batch)

    const_z = sample_nnoise(keys(), (args.num_test, args.latent_dim))

    @jax.jit
    def sample_fn(state):
        return G.apply({'params': state['G_ema'],
                        'moments': state['G_moments']}, const_z)

    return run_training(
        name='CIPS', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: {'params': s['G_ema'],
                                   'moments': s['G_moments']},
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[16, 'number of images for eval'],
        image_channels=[3, 'image channels'],
        latent_dim=[512, 'dimension of input latent'],
        style_dim=[512, 'dimension of style code'],
        num_layers=[14, 'number of style layers'],
        g_channels=[32, 'minimum channel width'],
        g_max_channels=[512, 'maximum channel width'],
        map_num_layers=[4, 'number of layers in mapping network'],
        no_pixel_norm=[False, 'disable pixel normalization'],
        d_channels=[64, 'minimum channel width'],
        d_max_channels=[512, 'maximum channel width'],
        mbsd_group_size=[4, 'mini-batch standard deviation group size'],
        mbsd_channels=[1, 'mini-batch standard deviation channels'],
        bottom=[4, 'bottom width'],
        filter_size=[4, 'filter size'],
        lr=[0.0025, 'learning rate'],
        map_lr_scale=[0.01, 'scale learning rate for mapping network with'],
        betas=[[0., 0.99], 'betas'],
        gp_lambda=[10., 'lambda for gradient penalty'],
        gp_every=[16, 'R1 every N steps'],
        policy=['color,translation', 'policy for diffaugment'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
