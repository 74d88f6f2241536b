'''AniGAN recipe (reference `implementations/AniGAN/utils.py`): hinge adv on
two domain branches (:83-87), feature matching on shared + branch features
pooled to 1x1 (:40-46), reconstruction G(B, B) ~ B (:112), EMA G (:123).
Domains: A = anime, B = face. `gp_lambda` is declared but the R1 penalty is
commented out in the reference loop (:84) — reproduced here (the reference's
R1 helper also has a fatal typo, `_clac_grad`, so it never ran).

SN power-iteration stats: the reference updates every module's spectral u
vector on every forward; here G's u updates once per step (in the G phase)
and D's on all eight D applies — same fixed-point, one fewer redundant
update.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.AniGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen, update_ema
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import HingeLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def feature_matching(feats_a, feats_b):
    '''L1 over 1x1-pooled features (reference feature_matching, :40-46).'''
    total = 0.
    for a, b in zip(feats_a, feats_b):
        a = jnp.mean(a.astype(jnp.float32), axis=(1, 2))
        b = jnp.mean(b.astype(jnp.float32), axis=(1, 2))
        total = total + jnp.mean(jnp.abs(a - b))
    return total


def build_train_step(G, D, g_tx, d_tx, loss, rec_lambda, feature_lambda,
                     ema_decay=0.999):
    def train_step(state, batch):
        A, B = batch
        rng = jax.random.split(state['rng'])[0]

        gv = {'params': state['G'], 'batch_stats': state['G_bs']}
        fakeA = G.apply(gv, B, A, train=False)
        fakeB = G.apply(gv, A, B, train=False)
        fa_sg, fb_sg = map(jax.lax.stop_gradient, (fakeA, fakeB))

        def d_loss_fn(d_params):
            m = {'batch_stats': state['D_bs']}
            (ra, _), m = D.apply({'params': d_params, **m}, A,
                                 return_features=False, train=True,
                                 mutable=['batch_stats'])
            (_, rb), m = D.apply({'params': d_params, **m}, B,
                                 return_features=False, train=True,
                                 mutable=['batch_stats'])
            (fa, _), m = D.apply({'params': d_params, **m}, fa_sg,
                                 return_features=False, train=True,
                                 mutable=['batch_stats'])
            (_, fb), m = D.apply({'params': d_params, **m}, fb_sg,
                                 return_features=False, train=True,
                                 mutable=['batch_stats'])
            return loss.d_loss(ra, fa) + loss.d_loss(rb, fb), m
        (d_loss, d_mut), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            gm = {'batch_stats': state['G_bs']}
            fA, gm = G.apply({'params': g_params, **gm}, B, A, train=True,
                             mutable=['batch_stats'])
            fB, gm = G.apply({'params': g_params, **gm}, A, B, train=True,
                             mutable=['batch_stats'])
            recB, gm = G.apply({'params': g_params, **gm}, B, B, train=True,
                               mutable=['batch_stats'])
            dm = d_mut
            (_, _, sh_ra, ra_f, _), dm = D.apply(
                {'params': d_params, **dm}, A, train=True,
                mutable=['batch_stats'])
            (_, _, sh_rb, _, rb_f), dm = D.apply(
                {'params': d_params, **dm}, B, train=True,
                mutable=['batch_stats'])
            (fa_p, _, sh_fa, fa_f, _), dm = D.apply(
                {'params': d_params, **dm}, fA, train=True,
                mutable=['batch_stats'])
            (_, fb_p, sh_fb, _, fb_f), dm = D.apply(
                {'params': d_params, **dm}, fB, train=True,
                mutable=['batch_stats'])
            fm = feature_matching(sh_fa, sh_ra) \
                + feature_matching(sh_fb, sh_rb) \
                + feature_matching(fa_f, ra_f) \
                + feature_matching(fb_f, rb_f)
            adv = loss.g_loss(fa_p) + loss.g_loss(fb_p)
            rec = jnp.mean(jnp.abs(recB - B))
            return (adv + fm * feature_lambda + rec * rec_lambda,
                    (gm['batch_stats'], dm['batch_stats']))

        (g_loss, (g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params,
                    G_bs=g_bs, D_bs=d_bs,
                    G_ema=update_ema(g_params, state['G_ema'], ema_decay),
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)
    bias = not args.disable_bias

    G = Generator(
        image_size=args.image_size, in_channels=args.image_channels,
        out_channels=args.image_channels, bottom_width=args.bottom_width,
        channels=args.g_channels, affine=args.affine,
        style_dim=args.style_dim, use_bias=bias,
        norm_name=args.g_norm_name, act_name=args.g_act_name,
        dtype=accel.compute_dtype)
    D = Discriminator(
        image_size=args.image_size, branch_width=args.branch_width,
        in_channels=args.image_channels, channels=args.d_channels,
        max_channels=args.max_channels, use_bias=bias,
        norm_name=args.d_norm_name, act_name=args.d_act_name,
        dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size, args.image_channels)
    g_vars = G.init(keys(), jnp.zeros(shape), jnp.zeros(shape))
    d_vars = D.init(keys(), jnp.zeros(shape))

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 G_bs=g_vars.get('batch_stats', {}),
                 D_bs=d_vars.get('batch_stats', {}),
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars['params']),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, HingeLoss(), args.rec_lambda, args.feature_lambda))

    test_A = jnp.asarray(test_batch[0])
    test_B = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        return G.apply({'params': state['G_ema'],
                        'batch_stats': state['G_bs']},
                       test_B, test_A, train=False)

    def sample_fn(state):
        import numpy as np
        return make_image_grid(np.asarray(test_B), np.asarray(test_A),
                               np.asarray(_gen(state)))

    return run_training(
        name='AniGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        image_channels=[3, 'image channels'],
        num_test=[4, 'number of test images'],
        bottom_width=[16, 'bottom width'],
        g_channels=[32, 'channel width multiplier'],
        affine=[False, 'affine transform style code in PoLIN. experimental.'],
        style_dim=[256, 'style dimension'],
        g_norm_name=['in', 'norm layer in encoder'],
        g_act_name=['lrelu', 'activation layer name'],
        branch_width=[32, 'last feature size in shared layers'],
        d_channels=[32, 'channel width multiplier'],
        max_channels=[512, 'maximum channels width'],
        d_norm_name=['in', 'normalization layer name'],
        d_act_name=['lrelu', 'activation function name'],
        disable_bias=[False, 'disable bias'],
        lr=[0.00002, 'learning rate'],
        betas=[[0., 0.999], 'betas'],
        rec_lambda=[1.2, 'lambda for reconstruction loss'],
        feature_lambda=[1., 'lambda for feature mapping loss'],
        gp_lambda=[1., 'lambda for r1 panalty'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'celeba')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
