'''SPADE recipe (reference `implementations/SPADE/utils.py`): hinge loss over
multi-scale D on (lineart ‖ image), feature matching + VGG + optional VAE
encoder KL.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.SPADE.model import (
    Generator, Discriminator, Encoder,
)
from animeface_tpu.implementations.pix2pixHD.utils import feature_matching
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import HingeLoss
from animeface_tpu.nnutils.loss.vgg import VGGLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, E, g_tx, d_tx, loss, vgg, feat_lambda, vgg_lambda,
                     kld_lambda, z_dim):
    use_e = E is not None

    def train_step(state, batch):
        image, seg = batch
        rng, zkey, ekey = jax.random.split(state['rng'], 3)
        B = image.shape[0]
        d_in = lambda x: jnp.concatenate([x, seg], axis=-1)

        def gen(g_params, e_params):
            if use_e:
                z, mu, logvar = E.apply({'params': e_params}, image, ekey)
            else:
                z = sample_nnoise(zkey, (B, z_dim))
                mu = logvar = None
            fake = G.apply({'params': g_params}, z, seg)
            return fake, mu, logvar

        fake, _, _ = gen(state['G'], state.get('E'))
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

        def g_loss_fn(params):
            g_params, e_params = params
            fake2, mu, logvar = gen(g_params, e_params)
            real_outs, _ = D.apply({'params': d_params, **d_mut},
                                   d_in(image), train=True,
                                   mutable=['batch_stats'])
            fake_outs, _ = D.apply({'params': d_params, **d_mut},
                                   d_in(fake2), train=True,
                                   mutable=['batch_stats'])
            g_loss = 0.0
            n_scale = len(real_outs)
            for (r_log, r_f), (f_log, f_f) in zip(real_outs, fake_outs):
                g_loss = g_loss + loss.g_loss(f_log)
                if feat_lambda > 0:
                    g_loss = g_loss + feature_matching(r_f, f_f) \
                        / n_scale * feat_lambda
            if vgg_lambda > 0:
                g_loss = g_loss + vgg.vgg_loss(image, fake2, p=1) * vgg_lambda
            if use_e and kld_lambda > 0:
                kld = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
                g_loss = g_loss + kld * kld_lambda
            return g_loss

        params = (state['G'], state.get('E'))
        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(params)
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], params)
        g_params, e_params = optax.apply_updates(params, g_up)

        new_state = dict(rng=rng, G=g_params, D={'params': d_params, **d_mut},
                         g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1)
        if use_e:
            new_state['E'] = e_params
        return new_state, dict(d=jnp.nan_to_num(d_loss),
                               g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    seg_ch = int(test_batch[1].shape[-1])
    G = Generator(image_size=args.image_size, z_dim=args.z_dim,
                  in_channels=seg_ch, channels=args.channels,
                  dtype=accel.compute_dtype)
    D = Discriminator(num_scale=args.d_num_scale, channels=args.d_channels,
                      sn=False, dtype=accel.compute_dtype)
    E = None if args.no_encoder else Encoder(
        image_size=args.image_size, z_dim=args.z_dim,
        channels=args.e_channels, dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size)
    g_vars = G.init(keys(), jnp.zeros((1, args.z_dim)),
                    jnp.zeros(shape + (seg_ch,)))
    d_vars = D.init(keys(), jnp.zeros(shape + (3 + seg_ch,)), train=True)
    if 'batch_stats' not in d_vars:
        d_vars = {'params': d_vars['params'], 'batch_stats': {}}
    e_vars = None if E is None else E.init(
        keys(), jnp.zeros(shape + (3,)), keys())

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    g_opt_params = (g_vars['params'], None if E is None else e_vars['params'])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars,
                 g_opt=g_tx.init(g_opt_params),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))
    if E is not None:
        state['E'] = e_vars['params']

    vgg = VGGLoss(vgg=16)
    train_step = accel.jit_step(build_train_step(
        G, D, E, g_tx, d_tx, HingeLoss(), vgg, args.feat_lambda,
        args.vgg_lambda, args.kld_lambda, args.z_dim))

    test_image = jnp.asarray(test_batch[0])
    test_seg = jnp.asarray(test_batch[1])
    const_z = sample_nnoise(keys(), (test_seg.shape[0], args.z_dim))

    @jax.jit
    def _gen(state):
        return G.apply({'params': state['G']}, const_z, test_seg)

    def sample_fn(state):
        import numpy as np
        gen = np.asarray(_gen(state))
        seg3 = np.repeat(np.asarray(test_seg), 3, axis=-1) \
            if test_seg.shape[-1] == 1 else np.asarray(test_seg)
        return make_image_grid(seg3, np.asarray(test_image), gen)

    return run_training(
        name='SPADE', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        z_dim=[256, 'style latent dimension'],
        channels=[32, 'G channel width'],
        d_num_scale=[2, 'D scales'],
        d_channels=[32, 'D channel width'],
        no_encoder=[False, 'disable the VAE style encoder'],
        e_channels=[32, 'E channel width'],
        lr=[0.0002, 'learning rate'],
        betas=[[0., 0.999], 'betas'],
        feat_lambda=[10., 'lambda for feature matching'],
        vgg_lambda=[10., 'lambda for VGG loss'],
        kld_lambda=[0.05, 'lambda for KL divergence'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
