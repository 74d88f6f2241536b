'''normalizations recipe (reference `implementations/normalizations/utils.py`):
reference-based colorization with selectable normalization; LSGAN multi-scale
D + L1 recon + VGG style/content losses, color-only DiffAugment on style.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.normalizations.model import (
    Generator, Discriminator,
)
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.loss.vgg import VGGLoss
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, g_tx, d_tx, loss, vgg, recon_lambda,
                     style_lambda, content_lambda):
    def train_step(state, batch):
        style_img, content = batch[0], batch[1]
        rng, akey = jax.random.split(state['rng'])

        style_aug = diff_augment(akey, style_img, 'color')
        fake, g_mut = G.apply(state['G'], content, style_aug, train=True,
                              mutable=['batch_stats'])
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params,
                      'batch_stats': state['D']['batch_stats']}
            real_outs, d_mut = D.apply(d_vars, style_aug, train=True,
                                       mutable=['batch_stats'])
            fake_outs, d_mut = D.apply({'params': d_params, **d_mut}, fake_sg,
                                       train=True, mutable=['batch_stats'])
            d_loss = 0.0
            for (r, _), (f, _) in zip(real_outs, fake_outs):
                d_loss = d_loss + loss.d_loss(r, f)
            return d_loss, d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params, **g_mut}, content,
                               style_aug, train=True, mutable=['batch_stats'])
            fake_outs, _ = D.apply({'params': d_params, **d_mut}, fake2,
                                   train=True, mutable=['batch_stats'])
            adv = 0.0
            for f, _ in fake_outs:
                adv = adv + loss.g_loss(f)
            recon = jnp.mean(jnp.abs(fake2 - style_aug)) * recon_lambda
            style_l = vgg.style_loss(style_aug, fake2) * style_lambda
            content3 = jnp.repeat(content, 3, axis=-1) \
                if content.shape[-1] == 1 else content
            content_l = vgg.content_loss(content3, fake2) * content_lambda
            return adv + recon + style_l + content_l

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        return dict(rng=rng, G={'params': g_params, **g_mut},
                    D={'params': d_params, **d_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(D=jnp.nan_to_num(d_loss), G=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    content_ch = int(test_batch[1].shape[-1])
    G = Generator(image_size=args.image_size, in_channels=content_ch,
                  channels=args.channels, style_dim=args.style_dim,
                  norm_name=args.norm_name, dtype=accel.compute_dtype)
    D = Discriminator(num_scale=args.d_num_scale, channels=args.d_channels,
                      sn=False, dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size)
    g_vars = G.init(keys(), jnp.zeros(shape + (content_ch,)),
                    jnp.zeros(shape + (3,)), train=True)
    d_vars = D.init(keys(), jnp.zeros(shape + (3,)), train=True)
    g_vars = dict(g_vars) if 'batch_stats' in g_vars else \
        {'params': g_vars['params'], 'batch_stats': {}}
    if 'batch_stats' not in d_vars:
        d_vars = {'params': d_vars['params'], 'batch_stats': {}}

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    vgg = VGGLoss(vgg=16)
    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, LSGANLoss(), vgg, args.recon_lambda,
        args.style_lambda, args.content_lambda))

    test_style = jnp.asarray(test_batch[0])
    test_content = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        return G.apply(state['G'], test_content, test_style, train=False)

    def sample_fn(state):
        import numpy as np
        c3 = np.repeat(np.asarray(test_content), 3, axis=-1) \
            if test_content.shape[-1] == 1 else np.asarray(test_content)
        return make_image_grid(c3, np.asarray(test_style),
                               np.asarray(_gen(state)))

    return run_training(
        name='normalizations', args=args, accel=accel, state=state,
        loader=loader, train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    # reference schema (utils.py:135-144); the model knobs below the first
    # block are hardcoded in the reference ("only normalization layer name
    # as a controllable parameter", utils.py:169-176) — exposed here at the
    # reference's hardcoded values so smokes can shrink the model
    parser = add_args(parser, dict(
        num_test=[4, 'number images for test.'],
        norm_name=['in', 'normalization layer name'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        style_lambda=[10., 'lambda for style loss'],
        content_lambda=[0., 'lambda for content loss'],
        recon_lambda=[5., 'lambda for reconstruction loss'],
        channels=[32, 'G channel width (reference hardcodes 32)'],
        style_dim=[512, 'style vector dimension (reference hardcodes 512)'],
        d_num_scale=[1, 'D scales (reference hardcodes num_discs=1)'],
        d_channels=[64, 'D channel width (reference hardcodes 64)'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
