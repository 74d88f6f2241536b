'''EDCNN recipe (author-original, reference
`implementations/original/EDCNN/utils.py`): reference-based gray->color
colorization. LSGAN on D(cat[gray, img]) + L1 recon + VGG style/vgg/content
losses; color-policy DiffAugment on the real rgb (utils.py:211-213); TTUR
halves G lr / doubles D lr (utils.py:202-206). The content term is scaled by
vgg_lambda, reproducing the reference exactly (utils.py:75). Dataset is
rgb + on-the-fly grayscale pairs (original/EDCNN/dataset.py — XDoG sketches
are explicitly unsuitable for the edge-enhancement module).'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from animeface_tpu.implementations.EDCNN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen, apply_mutable, split_vars
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.initialize import apply_init
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.loss.vgg import VGGLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, g_tx, d_tx, loss, vgg, recon_lambda, style_lambda,
                     vgg_lambda, content_lambda):
    def train_step(state, batch):
        rgb, gray = batch
        rng, ak = jax.random.split(state['rng'])
        real = diff_augment(ak, rgb, 'color')   # reference utils.py:46,211

        g_extra = {k: v for k, v in state['G'].items() if k != 'params'}
        d_extra = {k: v for k, v in state['D'].items() if k != 'params'}

        fake, g_mut = apply_mutable(G, state['G']['params'], g_extra,
                                    gray, real, train=True)
        fake_sg = jax.lax.stop_gradient(fake)
        d_in = lambda img: jnp.concatenate([gray, img], axis=-1)

        def d_loss_fn(d_params):
            (real_prob, _), d_mut = apply_mutable(D, d_params, d_extra,
                                                  d_in(real), train=True)
            (fake_prob, _), d_mut = apply_mutable(D, d_params, d_mut,
                                                  d_in(fake_sg), train=True)
            return loss.d_loss(real_prob, fake_prob), d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2, g_mut2 = apply_mutable(G, g_params, g_extra,
                                          gray, real, train=True)
            (fake_prob, _), _ = apply_mutable(D, d_params, d_mut,
                                              d_in(fake2), train=True)
            g_loss = loss.g_loss(fake_prob)
            if recon_lambda > 0:
                g_loss += jnp.mean(jnp.abs(fake2 - real)) * recon_lambda
            if style_lambda > 0:
                g_loss += vgg.style_loss(real, fake2) * style_lambda
            if vgg_lambda > 0:
                g_loss += vgg.vgg_loss(real, fake2) * vgg_lambda
            if content_lambda > 0:
                # reference utils.py:75 scales the content term by vgg_lambda
                gray3 = jnp.repeat(gray, 3, axis=-1)
                g_loss += vgg.content_loss(gray3, fake2) * vgg_lambda
            return g_loss, g_mut2

        (g_loss, g_mut), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        return dict(rng=rng, G={'params': g_params, **g_mut},
                    D={'params': d_params, **d_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(
        image_size=args.image_size, in_channels=args.gray_channels,
        ref_channels=args.ref_channels, channels=args.channels,
        style_dim=args.style_dim, bottom_width=args.bottom_width,
        se_blocks_per_resl=args.se_blocks_per_resl,
        num_res_blocks=args.num_res_blocks, sobel=not args.disable_sobel,
        learnable_sobel=not args.disable_learnable_sobel,
        e_conv_per_resl=args.e_conv_per_resl, sn=not args.disable_sn,
        use_bias=not args.disable_bias, norm_name=args.norm_name,
        act_name=args.act_name, dtype=accel.compute_dtype)
    D = Discriminator(
        num_layers=args.num_layers, channels=args.channels,
        sn=not args.disable_sn, use_bias=not args.disable_bias,
        norm_name=args.norm_name, act_name=args.act_name,
        dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size)
    g_vars = dict(G.init(keys(), jnp.zeros(shape + (args.gray_channels,)),
                         jnp.zeros(shape + (args.ref_channels,)), train=True))
    d_vars = dict(D.init(
        keys(), jnp.zeros(shape + (args.ref_channels + args.gray_channels,)),
        train=True))
    g_params, _ = split_vars(g_vars)
    d_params, _ = split_vars(d_vars)
    g_vars['params'] = apply_init(keys(), g_params, args.init_func)
    d_vars['params'] = apply_init(keys(), d_params, args.init_func)

    g_lr, d_lr = (args.lr / 2, args.lr * 2) if args.ttur \
        else (args.lr, args.lr)
    g_tx = optax.adam(g_lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(d_lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    vgg = VGGLoss(vgg=16, p=1)   # reference utils.py:33 VGGLoss(device, p=1)
    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, LSGANLoss(), vgg, args.recon_lambda,
        args.style_lambda, args.vgg_lambda, args.content_lambda))

    test_rgb = jnp.asarray(test_batch[0])
    test_gray = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        out, _ = apply_mutable(
            G, state['G']['params'],
            {k: v for k, v in state['G'].items() if k != 'params'},
            test_gray, test_rgb, train=False)
        return out

    def sample_fn(state):
        gray3 = np.repeat(np.asarray(test_gray), 3, axis=-1)
        return make_image_grid(gray3, np.asarray(test_rgb),
                               np.asarray(_gen(state)))

    return run_training(
        name='EDCNN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=9,
        ema_params_path=lambda s: s['G']['params'],
    )


def main(parser):
    parser = add_args(parser, dict(
        num_test=[6, 'number of test samples'],
        gray_channels=[1, 'number of channels in gray images'],
        ref_channels=[3, 'number of channels in reference images'],
        channels=[32, 'channel width mutiplier'],
        style_dim=[128, 'dimension of style code'],
        se_blocks_per_resl=[1, 'resblocks per resolution in style encoder'],
        num_res_blocks=[5, 'number of resblocks'],
        disable_sobel=[False, 'disable sobel conv2d'],
        disable_learnable_sobel=['disable learnability'],
        e_conv_per_resl=[2, 'number of conv per resolution in en/decoder'],
        disable_sn=[False, 'disable spectral norm'],
        disable_bias=[False, 'disable bias'],
        norm_name=['in', 'normalization layer name'],
        act_name=['lrelu', 'activation function name'],
        bottom_width=[8, 'bottom width'],
        num_layers=[3, 'number of layer in D'],
        init_func=['N002', 'one of "N002", "xavier", "kaiming"'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        recon_lambda=[10., 'lambda for reconstruction loss'],
        style_lambda=[50., 'lambda for style loss'],
        vgg_lambda=[10., 'lambda for vgg loss'],
        content_lambda=[0., 'lambda for content loss'],
        ttur=[False, 'use TTUR'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'gray')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
