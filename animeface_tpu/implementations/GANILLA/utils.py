'''GANILLA recipe (reference `implementations/GANILLA/utils.py`): CycleGAN-
style unpaired training (LSGAN + cycle consistency) with GANILLA generators
on anime/CelebA domain pairs; one Adam over both Gs and one over both Ds.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.GANILLA.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G_ab, G_ba, D_a, D_b, g_tx, d_tx, loss, cycle_lambda):
    def train_step(state, batch):
        a, b = batch
        rng = jax.random.split(state['rng'])[0]

        gab_v = {'params': state['G_ab'], 'batch_stats': state['G_ab_bs']}
        gba_v = {'params': state['G_ba'], 'batch_stats': state['G_ba_bs']}
        fake_b, _ = G_ab.apply(gab_v, a, train=True, mutable=['batch_stats'])
        fake_a, _ = G_ba.apply(gba_v, b, train=True, mutable=['batch_stats'])
        fb_sg, fa_sg = map(jax.lax.stop_gradient, (fake_b, fake_a))

        def d_loss_fn(d_params):
            da, db = d_params
            ma = {'batch_stats': state['D_a_bs']}
            mb = {'batch_stats': state['D_b_bs']}
            (ra, _), ma = D_a.apply({'params': da, **ma}, a, train=True,
                                    mutable=['batch_stats'])
            (fa, _), ma = D_a.apply({'params': da, **ma}, fa_sg, train=True,
                                    mutable=['batch_stats'])
            (rb, _), mb = D_b.apply({'params': db, **mb}, b, train=True,
                                    mutable=['batch_stats'])
            (fb, _), mb = D_b.apply({'params': db, **mb}, fb_sg, train=True,
                                    mutable=['batch_stats'])
            return loss.d_loss(ra, fa) + loss.d_loss(rb, fb), \
                (ma['batch_stats'], mb['batch_stats'])

        (d_loss, (da_bs, db_bs)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)((state['D_a'], state['D_b']))
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'],
                                  (state['D_a'], state['D_b']))
        d_a, d_b = optax.apply_updates((state['D_a'], state['D_b']), d_up)

        def g_loss_fn(g_params):
            gab, gba = g_params
            gm_ab = {'batch_stats': state['G_ab_bs']}
            gm_ba = {'batch_stats': state['G_ba_bs']}
            fb, gm_ab = G_ab.apply({'params': gab, **gm_ab}, a, train=True,
                                   mutable=['batch_stats'])
            fa, gm_ba = G_ba.apply({'params': gba, **gm_ba}, b, train=True,
                                   mutable=['batch_stats'])
            rec_a, gm_ba = G_ba.apply({'params': gba, **gm_ba}, fb,
                                      train=True, mutable=['batch_stats'])
            rec_b, gm_ab = G_ab.apply({'params': gab, **gm_ab}, fa,
                                      train=True, mutable=['batch_stats'])
            (pa, _), _ = D_a.apply({'params': d_a, 'batch_stats': da_bs}, fa,
                                   train=True, mutable=['batch_stats'])
            (pb, _), _ = D_b.apply({'params': d_b, 'batch_stats': db_bs}, fb,
                                   train=True, mutable=['batch_stats'])
            adv = loss.g_loss(pa) + loss.g_loss(pb)
            cyc = jnp.mean(jnp.abs(rec_a - a)) + jnp.mean(jnp.abs(rec_b - b))
            return adv + cyc * cycle_lambda, \
                (gm_ab['batch_stats'], gm_ba['batch_stats'])

        (g_loss, (gab_bs, gba_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)((state['G_ab'], state['G_ba']))
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'],
                                  (state['G_ab'], state['G_ba']))
        g_ab, g_ba = optax.apply_updates((state['G_ab'], state['G_ba']), g_up)

        return dict(rng=rng, G_ab=g_ab, G_ba=g_ba, D_a=d_a, D_b=d_b,
                    G_ab_bs=gab_bs, G_ba_bs=gba_bs,
                    D_a_bs=da_bs, D_b_bs=db_bs,
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=d_loss, g=g_loss)

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    mk_g = lambda: Generator(image_size=args.image_size,
                             image_channels=args.image_channels,
                             bottom_width=args.bottom_width,
                             num_downs=args.num_downs,
                             num_feats=args.num_feats,
                             channels=args.g_channels,
                             hid_channels=args.hid_channels,
                             layer_num_blocks=args.layer_num_blocks,
                             sn=not args.g_disable_sn, use_bias=args.g_bias,
                             norm_name=args.g_norm_name,
                             act_name=args.g_act_name,
                             dtype=accel.compute_dtype)
    mk_d = lambda: Discriminator(in_channels=args.image_channels,
                                 num_layers=args.num_layers,
                                 channels=args.d_channels,
                                 sn=not args.d_disable_sn,
                                 use_bias=not args.d_disable_bias,
                                 norm_name=args.d_norm_name,
                                 act_name=args.d_act_name,
                                 dtype=accel.compute_dtype)
    G_ab, G_ba = mk_g(), mk_g()
    D_a, D_b = mk_d(), mk_d()

    shape = (1, args.image_size, args.image_size, args.image_channels)
    gab_v = G_ab.init(keys(), jnp.zeros(shape))
    gba_v = G_ba.init(keys(), jnp.zeros(shape))
    da_v = D_a.init(keys(), jnp.zeros(shape))
    db_v = D_b.init(keys(), jnp.zeros(shape))

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(),
                 G_ab=gab_v['params'], G_ba=gba_v['params'],
                 D_a=da_v['params'], D_b=db_v['params'],
                 G_ab_bs=gab_v.get('batch_stats', {}),
                 G_ba_bs=gba_v.get('batch_stats', {}),
                 D_a_bs=da_v.get('batch_stats', {}),
                 D_b_bs=db_v.get('batch_stats', {}),
                 g_opt=g_tx.init((gab_v['params'], gba_v['params'])),
                 d_opt=d_tx.init((da_v['params'], db_v['params'])),
                 step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G_ab, G_ba, D_a, D_b, g_tx, d_tx, LSGANLoss(), args.cycle_lambda))

    test_a = jnp.asarray(test_batch[0])

    @jax.jit
    def _gen(state):
        return G_ab.apply(
            {'params': state['G_ab'], 'batch_stats': state['G_ab_bs']},
            test_a, train=False)

    def sample_fn(state):
        import numpy as np
        return make_image_grid(np.asarray(test_a), np.asarray(_gen(state)))

    return run_training(
        name='GANILLA', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=4,
        ema_params_path=lambda s: {'G_ab': s['G_ab'], 'G_ba': s['G_ba']},
    )


def main(parser):
    # reference add_args schema (utils.py:126-148), verbatim
    parser = add_args(parser, dict(
        num_test=[6, 'number of images for eval'],
        image_channels=[3, 'image channels'],
        bottom_width=[8, 'bottom width'],
        num_downs=[int, 'number of up/down sampling'],
        num_feats=[3, 'number of features to return from the encoder'],
        g_channels=[32, 'channel_width multiplier'],
        hid_channels=[128, 'channels in decoder'],
        layer_num_blocks=[2, 'number of blocks in one GANILLA layer'],
        g_disable_sn=[False, 'disable spectral norm'],
        g_bias=[False, 'enable bias'],
        g_norm_name=['in', 'normalization layer name'],
        g_act_name=['lrelu', 'activation function name'],
        num_layers=[3, 'number of layers'],
        d_channels=[32, 'channel width multiplier'],
        d_disable_sn=[False, 'disable spectral norm'],
        d_disable_bias=[False, 'disable bias'],
        d_norm_name=['in', 'normalization layer name'],
        d_act_name=['relu', 'activation function name'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        cycle_lambda=[10., 'lambda for cycle consistency loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'celeba')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
