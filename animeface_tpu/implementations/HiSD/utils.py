'''HiSD recipe (reference `implementations/HiSD/utils.py`): per step, sample a
category i and tag pair (j -> j_); LSGAN on the (fake, cycle) D channel pair,
style reconstruction between mapped and extracted codes, and image
reconstructions (plain / self-translate / cycle), EMA G. One compiled step
per category (tags are traced).'''

from __future__ import annotations

import os
import random

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.HiSD.model import Generator, Discriminator
from animeface_tpu.implementations.HiSD.dataset import make_categories
from animeface_tpu.utils import add_args, save_args, Status, save_image, \
    make_image_grid
from animeface_tpu.utils.argument import result_dir
from animeface_tpu.nnutils import KeyGen, sample_nnoise, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.checkpoint import save_model


def build_train_step(G, D, g_tx, d_tx, loss, i, num_cat,
                     recons_lambda, style_lambda, ema_decay):
    '''Compiled per category i; j/j_ are traced ints in state batch.'''

    def refs_with(data, j):
        refs = [None] * num_cat
        refs[i] = (data, j)
        return refs

    def train_step(state, real, j, j_):
        rng, zkey = jax.random.split(state['rng'])
        B = real.shape[0]
        z = sample_nnoise(zkey, (B, G.latent_dim))

        gv0 = {'params': state['G']}
        fake = G.apply(gv0, real, refs_with(z, j_))
        recons_fake = G.apply(gv0, fake, refs_with(real, j))
        fake_sg = jax.lax.stop_gradient(fake)
        rf_sg = jax.lax.stop_gradient(recons_fake)

        def d_loss_fn(d_params):
            dv = {'params': d_params}
            real_p = D.apply(dv, real, i, j)
            fake_p = D.apply(dv, fake_sg, i, j_)
            rec_p = D.apply(dv, rf_sg, i, j)
            return loss.d_loss(real_p[..., 0], fake_p[..., 0]) \
                + loss.d_loss(real_p[..., 1], rec_p[..., 1])

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            gv = {'params': g_params}
            fake2 = G.apply(gv, real, refs_with(z, j_))
            recons2 = G.apply(gv, real)
            recons_self2 = G.apply(gv, real, refs_with(real, j))
            recons_fake2 = G.apply(gv, fake2, refs_with(real, j))
            fake_p = D.apply({'params': d_params}, fake2, i, j_)
            rec_p = D.apply({'params': d_params}, recons_fake2, i, j)
            style_mapped = G.apply(gv, z, j_,
                                   method=lambda m, zz, jj: m.map_style(i, zz, jj))
            style_fake = G.apply(gv, fake2, j_,
                                 method=lambda m, x, jj: m.extract_style(i, x, jj))
            g_loss = loss.g_loss(fake_p[..., 0]) + loss.g_loss(rec_p[..., 1])
            g_loss = g_loss + jnp.mean(jnp.abs(style_mapped - style_fake)) \
                * style_lambda
            g_loss = g_loss + (jnp.mean(jnp.abs(recons2 - real))
                               + jnp.mean(jnp.abs(recons_self2 - real))
                               + jnp.mean(jnp.abs(recons_fake2 - real))) \
                * recons_lambda
            return g_loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params,
                    G_ema=update_ema(g_params, state['G_ema'], ema_decay),
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(G=jnp.nan_to_num(g_loss), D=jnp.nan_to_num(d_loss)), fake

    return train_step


def train(args, max_iters, categories):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)
    out_dir = result_dir('HiSD')
    num_tags = [c.num_tags for c in categories]

    G = Generator(tags=tuple(num_tags), image_size=args.image_size,
                  style_dim=args.style_dim, latent_dim=args.latent_dim,
                  channels=args.channels,
                  trans_num_blocks=args.trans_num_blocks,
                  dtype=accel.compute_dtype)
    D = Discriminator(tags=tuple(num_tags), channels=args.d_channels,
                      dtype=accel.compute_dtype)

    x0 = jnp.zeros((1, args.image_size, args.image_size, 3))
    z0 = jnp.zeros((1, args.latent_dim))
    g_vars = G.init(keys(), x0, z0, method=Generator.init_forward)
    d_params = {}
    for ci in range(len(num_tags)):
        dv = D.init(keys(), x0, ci, jnp.int32(0))
        d_params.update(dv['params'])
    d_vars = {'params': d_params}

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    loss = LSGANLoss()
    steps = {
        ci: accel.jit(build_train_step(
            G, D, g_tx, d_tx, loss, ci, len(num_tags),
            args.recons_lambda, args.style_lambda, args.ema_decay))
        for ci in range(len(num_tags))
    }

    status = Status(max_iters, bar=not args.log_file, log_file=args.log_file)
    py_rng = random.Random(args.seed)

    while not status.is_end():
        i = py_rng.randrange(len(num_tags))
        j = py_rng.randrange(num_tags[i])
        j_ = py_rng.randrange(num_tags[i])
        while num_tags[i] > 1 and j_ == j:
            j_ = py_rng.randrange(num_tags[i])
        real = jnp.asarray(categories[i].sample(j))
        state, metrics, fake = steps[i](state, real, jnp.int32(j),
                                        jnp.int32(j_))
        if status.batches_done % args.save == 0 and status.batches_done:
            grid = make_image_grid(np.asarray(real), np.asarray(fake))
            save_image(grid, os.path.join(
                out_dir, f'{status.batches_done}_tag{i}_{j}to{j_}.jpg'),
                nrow=4)
            save_model(os.path.join(out_dir,
                                    f'G_{status.batches_done}.msgpack'),
                       state['G_ema'])
        status.update(**metrics)

    status.plot_loss(os.path.join(out_dir, 'loss'))
    save_model(os.path.join(out_dir, 'G_final.msgpack'), state['G_ema'])
    return state, status


def main(parser):
    parser = add_args(parser, dict(
        style_dim=[256, 'style code dimension'],
        latent_dim=[32, 'latent input dimension'],
        channels=[32, 'G channel width'],
        trans_num_blocks=[7, 'translator blocks'],
        d_channels=[32, 'D channel width'],
        lr=[0.0001, 'learning rate'],
        betas=[[0., 0.99], 'betas'],
        recons_lambda=[1., 'lambda for reconstructions'],
        style_lambda=[1., 'lambda for style recon'],
        ema_decay=[0.999, 'EMA decay'],
    ))
    args = parser.parse_args()
    save_args(args)

    categories = make_categories(args)
    max_iters = args.max_iters if args.max_iters > 0 else 500_000
    train(args, max_iters, categories)
