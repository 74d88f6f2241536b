'''pix2pixHD recipe (reference `implementations/pix2pixHD/utils.py`): LSGAN
over a multi-scale feature D on (lineart ‖ image), feature-matching + VGG
perceptual losses, linear lr decay.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.pix2pixHD.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.loss.vgg import VGGLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def feature_matching(real_feats, fake_feats):
    '''Per-layer L1 over D features (reference utils.py:20).'''
    loss = 0.0
    n = len(real_feats)
    for rf, ff in zip(real_feats, fake_feats):
        loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(rf) - ff)) / n
    return loss


def build_train_step(G, D, g_tx, d_tx, loss, vgg, feat_lambda, vgg_lambda):
    def train_step(state, batch):
        image, line = batch
        rng = jax.random.split(state['rng'])[0]
        d_in = lambda x: jnp.concatenate([x, line], axis=-1)

        (fake, fake_g), _ = G.apply(state['G'], line, mutable=[])
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params,
                      'batch_stats': state['D']['batch_stats']}
            real_outs, d_mut = D.apply(d_vars, d_in(image), train=True,
                                       mutable=['batch_stats'])
            fake_outs, d_mut = D.apply({'params': d_params, **d_mut},
                                       d_in(fake_sg), train=True,
                                       mutable=['batch_stats'])
            d_loss = 0.0
            for (r_log, _), (f_log, _) in zip(real_outs, fake_outs):
                d_loss = d_loss + loss.d_loss(r_log, f_log)
            return d_loss, d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            (fake2, fake2_g), _ = G.apply({'params': g_params}, line,
                                          mutable=[])
            real_outs, _ = D.apply({'params': d_params, **d_mut},
                                   d_in(image), train=True,
                                   mutable=['batch_stats'])
            fake_outs, _ = D.apply({'params': d_params, **d_mut},
                                   d_in(fake2), train=True,
                                   mutable=['batch_stats'])
            g_loss = 0.0
            for (r_log, r_f), (f_log, f_f) in zip(real_outs, fake_outs):
                g_loss = g_loss + loss.g_loss(f_log)
                g_loss = g_loss + feature_matching(r_f, f_f) * feat_lambda
            g_loss = g_loss + vgg.vgg_loss(image, fake2, p=1) * vgg_lambda
            return g_loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        return dict(rng=rng, G={'params': g_params},
                    D={'params': d_params, **d_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch, name='pix2pixHD'):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    line_ch = int(test_batch[1].shape[-1])
    G = Generator(out_channels=3, channels=args.channels,
                  dtype=accel.compute_dtype)
    D = Discriminator(num_scale=args.d_num_scale, channels=args.d_channels,
                      sn=False, dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size)
    g_vars = G.init(keys(), jnp.zeros(shape + (line_ch,)))
    d_vars = D.init(keys(), jnp.zeros(shape + (3 + line_ch,)), train=True)
    if 'batch_stats' not in d_vars:
        d_vars = {'params': d_vars['params'], 'batch_stats': {}}

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    vgg = VGGLoss(vgg=16)
    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, LSGANLoss(), vgg, args.feat_lambda,
        args.vgg_lambda))

    test_image = jnp.asarray(test_batch[0])
    test_line = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        (out, _), _ = G.apply(state['G'], test_line, mutable=[])
        return out

    def sample_fn(state):
        import numpy as np
        gen = np.asarray(_gen(state))
        line3 = np.repeat(np.asarray(test_line), 3, axis=-1) \
            if test_line.shape[-1] == 1 else np.asarray(test_line)
        return make_image_grid(line3, np.asarray(test_image), gen)

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        channels=[32, 'G channel width'],
        d_num_scale=[2, 'number of D scales'],
        d_channels=[32, 'D channel width'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        feat_lambda=[10., 'lambda for feature matching'],
        vgg_lambda=[10., 'lambda for VGG loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
