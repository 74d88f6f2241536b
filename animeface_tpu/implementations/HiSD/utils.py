'''HiSD recipe (reference `implementations/HiSD/utils.py`): per step, sample
a category i and tag pair (j -> j_); LSGAN on the (fake, cycle) D channel
pair (:99-100), optional pix2pixHD feature matching when --ret_feat
(:101-103 via feature_matching :22), style reconstruction between mapped and
extracted codes, image reconstructions (plain / self-translate / cycle), EMA
G, xavier init (:261-263), and a separate --map_lr for the mapper networks
(:266-272). One compiled step per category (tags are traced).'''

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
from animeface_tpu.nnutils.initialize import apply_init
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.checkpoint import save_model


def _feature_matching(real_feats, fake_feats):
    '''mean L1 over D feature maps (reference feature_matching :22).'''
    fm = 0.0
    for r, f in zip(real_feats, fake_feats):
        fm = fm + jnp.mean(jnp.abs(r - f))
    return fm / len(real_feats)


def build_train_step(G, D, g_tx, d_tx, loss, i, num_cat,
                     recons_lambda, style_lambda, feat_lambda, ret_feat,
                     ema_decay):
    '''Compiled per category i; j/j_ are traced ints in state batch.'''

    def refs_with(data, j):
        refs = [None] * num_cat
        refs[i] = (data, j)
        return refs

    def d_apply(d_params, img, jj):
        out = D.apply({'params': d_params}, img, i, jj)
        if ret_feat:
            return out
        return out, None

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
            real_p, real_f = d_apply(d_params, real, j)
            fake_p, fake_f = d_apply(d_params, fake_sg, j_)
            rec_p, _ = d_apply(d_params, rf_sg, j)
            d_l = loss.d_loss(real_p[..., 0], fake_p[..., 0]) \
                + loss.d_loss(real_p[..., 1], rec_p[..., 1])
            if ret_feat and feat_lambda > 0:
                d_l = d_l + _feature_matching(real_f, fake_f) * feat_lambda
            return d_l

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            gv = {'params': g_params}
            fake2 = G.apply(gv, real, refs_with(z, j_))
            recons2 = G.apply(gv, real)
            recons_self2 = G.apply(gv, real, refs_with(real, j))
            recons_fake2 = G.apply(gv, fake2, refs_with(real, j))
            fake_p, _ = d_apply(d_params, fake2, j_)
            rec_p, _ = d_apply(d_params, recons_fake2, j)
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


def _mapper_lr_tx(args):
    '''Adam with --map_lr on the mapper subtrees, --lr elsewhere
    (reference optimizer param groups :266-272).'''
    def label_fn(params):
        return {k: ('map' if k.startswith('map_') else 'rest')
                for k in params}
    return optax.multi_transform(
        {'map': optax.adam(args.map_lr, b1=args.betas[0], b2=args.betas[1]),
         'rest': optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])},
        label_fn)


def train(args, max_iters, categories):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)
    out_dir = result_dir('HiSD')
    num_tags = [c.num_tags for c in categories]

    kw = dict(
        tags=tuple(num_tags), image_size=args.image_size,
        image_channels=args.image_channels, style_dim=args.style_dim,
        latent_dim=args.latent_dim, enc_num_downs=args.enc_num_downs,
        map_mid_dim=args.map_mid_dim,
        map_num_shared_layers=args.map_num_shared_layers,
        map_num_tag_layers=args.map_num_tag_layers, channels=args.channels,
        ex_bottom_width=args.ex_bottom_width,
        trans_num_blocks=args.trans_num_blocks, norm_name=args.norm_name,
        act_name=args.act_name, use_bias=not args.no_bias,
        normalize_latent=args.normalize_latent,
        single_path=args.single_path, affine_each=args.affine_each,
        dtype=accel.compute_dtype)
    G = Generator(**kw)
    D = Discriminator(tags=tuple(num_tags),
                      image_channels=args.image_channels,
                      num_layers=args.num_layers, channels=args.channels,
                      norm_name=args.norm_name, act_name=args.act_name,
                      use_bias=not args.no_bias, ret_feat=args.ret_feat,
                      single_path=args.single_path,
                      dtype=accel.compute_dtype)

    x0 = jnp.zeros((1, args.image_size, args.image_size,
                    args.image_channels))
    z0 = jnp.zeros((1, args.latent_dim))
    g_vars = G.init(keys(), x0, z0, method=Generator.init_forward)
    d_params = {}
    cats_to_init = [0] if args.single_path else range(len(num_tags))
    for ci in cats_to_init:
        dv = D.init(keys(), x0, ci, jnp.int32(0))
        d_params.update(dv['params'])
    g_params = apply_init(keys(), g_vars['params'], 'xavier')
    d_params = apply_init(keys(), d_params, 'xavier')

    g_tx = _mapper_lr_tx(args)
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_params, D=d_params,
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_params),
                 g_opt=g_tx.init(g_params),
                 d_opt=d_tx.init(d_params), step=jnp.int32(0))

    loss = LSGANLoss()
    steps = {
        ci: accel.jit(build_train_step(
            G, D, g_tx, d_tx, loss, ci, len(num_tags),
            args.recons_lambda, args.style_lambda, args.feat_lambda,
            args.ret_feat, args.ema_decay))
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
        latent_dim=[128, 'input latent dimension'],
        enc_num_downs=[2, 'number of downsampling res-blocks in '
                          'encoder/decoder'],
        map_mid_dim=[256, 'dimension of middle layers in mapper network'],
        map_num_shared_layers=[3, 'number of shared layers for all tags in '
                                  'a category'],
        map_num_tag_layers=[3, 'number of layers for each tags in a '
                               'category'],
        channels=[32, 'channel width multiplier'],
        ex_bottom_width=[8, 'minimum width before global avgpool in '
                            'extractor network'],
        trans_num_blocks=[7, 'number of res-blocks in translator network'],
        num_layers=[3, 'number of layers in D'],
        norm_name=['in', 'normalization layer name'],
        act_name=['lrelu', 'activation function name'],
        no_bias=[False, 'disable bias'],
        normalize_latent=[False, 'use pixel norm to input latent'],
        single_path=[False, 'use only one branch for all tags'],
        affine_each=[False, 'affine input at each AdaIN layer'],
        ret_feat=[False, 'return features from D'],
        category=[['hair', 'eye', 'glass'], 'categories'],
        image_channels=[3, 'image channels'],
        lr=[0.0001, 'learning rate'],
        map_lr=[0.000001, 'learning rate for mapper network'],
        betas=[[0., 0.99], 'betas'],
        feat_lambda=[10., 'lambda for feature matching loss'],
        recons_lambda=[1., 'lambda for reconstruction loss'],
        style_lambda=[1., 'lambda for style loss'],
        ema_decay=[0.999, 'decay for EMA'],
    ))
    args = parser.parse_args()
    save_args(args)

    categories = make_categories(args, names=tuple(args.category))
    max_iters = args.max_iters if args.max_iters > 0 else 500_000
    train(args, max_iters, categories)
