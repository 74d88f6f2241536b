'''GANILLA recipe (reference `implementations/GANILLA/utils.py`): CycleGAN-
style unpaired training (LSGAN + cycle consistency) with GANILLA generators
on anime/CelebA domain pairs.'''

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

        fake_b = G_ab.apply({'params': state['G_ab']}, a)
        fake_a = G_ba.apply({'params': state['G_ba']}, b)
        fb_sg, fa_sg = map(jax.lax.stop_gradient, (fake_b, fake_a))

        def d_loss_fn(d_params):
            da, db = d_params
            ra, _ = D_a.apply({'params': da}, a)
            fa, _ = D_a.apply({'params': da}, fa_sg)
            rb, _ = D_b.apply({'params': db}, b)
            fb, _ = D_b.apply({'params': db}, fb_sg)
            return loss.d_loss(ra, fa) + loss.d_loss(rb, fb)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            (state['D_a'], state['D_b']))
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'],
                                  (state['D_a'], state['D_b']))
        d_a, d_b = optax.apply_updates((state['D_a'], state['D_b']), d_up)

        def g_loss_fn(g_params):
            gab, gba = g_params
            fb = G_ab.apply({'params': gab}, a)
            fa = G_ba.apply({'params': gba}, b)
            rec_a = G_ba.apply({'params': gba}, fb)
            rec_b = G_ab.apply({'params': gab}, fa)
            pa, _ = D_a.apply({'params': d_a}, fa)
            pb, _ = D_b.apply({'params': d_b}, fb)
            adv = loss.g_loss(pa) + loss.g_loss(pb)
            cyc = jnp.mean(jnp.abs(rec_a - a)) + jnp.mean(jnp.abs(rec_b - b))
            return adv + cyc * cycle_lambda

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(
            (state['G_ab'], state['G_ba']))
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'],
                                  (state['G_ab'], state['G_ba']))
        g_ab, g_ba = optax.apply_updates((state['G_ab'], state['G_ba']), g_up)

        return dict(rng=rng, G_ab=g_ab, G_ba=g_ba, D_a=d_a, D_b=d_b,
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=d_loss, g=g_loss)

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    mk_g = lambda: Generator(image_size=args.image_size,
                             channels=args.channels,
                             hid_channels=args.hid_channels,
                             num_feats=args.num_feats,
                             dtype=accel.compute_dtype)
    G_ab, G_ba = mk_g(), mk_g()
    D_a = Discriminator(channels=args.d_channels, dtype=accel.compute_dtype)
    D_b = Discriminator(channels=args.d_channels, dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size, 3)
    gab_v = G_ab.init(keys(), jnp.zeros(shape))
    gba_v = G_ba.init(keys(), jnp.zeros(shape))
    da_v = D_a.init(keys(), jnp.zeros(shape))
    db_v = D_b.init(keys(), jnp.zeros(shape))

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(),
                 G_ab=gab_v['params'], G_ba=gba_v['params'],
                 D_a=da_v['params'], D_b=db_v['params'],
                 g_opt=g_tx.init((gab_v['params'], gba_v['params'])),
                 d_opt=d_tx.init((da_v['params'], db_v['params'])),
                 step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G_ab, G_ba, D_a, D_b, g_tx, d_tx, LSGANLoss(), args.cycle_lambda))

    test_a = jnp.asarray(test_batch[0])

    @jax.jit
    def _gen(state):
        return G_ab.apply({'params': state['G_ab']}, test_a)

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
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        channels=[32, 'G channel width'],
        hid_channels=[128, 'decoder hidden channels'],
        num_feats=[3, 'encoder skip features'],
        d_channels=[32, 'D channel width'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        cycle_lambda=[10., 'lambda for cycle'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'celeba')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
