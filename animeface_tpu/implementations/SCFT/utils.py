'''SCFT recipe (reference `implementations/SCFT/utils.py`): LSGAN on
(sketch ‖ image) + L1 recon + VGG style/perceptual + similarity-based triplet
loss over SCFT (q, k) pairs, with TPS-warped reference as positive style.
Optimizers: Adam(g_lr=1e-4) for G, Adam(d_lr=2e-4) for D (reference
utils.py:214-215).'''

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.SCFT.model import Generator, Discriminator
from animeface_tpu.implementations.SCFT.tps import tps_transform
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import LSGANLoss
from animeface_tpu.nnutils.loss.vgg import VGGLoss
from animeface_tpu.nnutils.diffaugment import diff_augment
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def triplet_loss(anchor, negative, positive, margin):
    '''relu(-|a.p| + |a.n| + margin), dot products scaled by
    sqrt(feature size) (reference utils.py:23-29).'''
    a = anchor.reshape(anchor.shape[0], -1)
    n = negative.reshape(negative.shape[0], -1)
    p = positive.reshape(positive.shape[0], -1)
    scale = np.sqrt(a.shape[1])
    ap = jnp.sum(a * p, axis=1) / scale
    an = jnp.sum(a * n, axis=1) / scale
    return jnp.mean(jax.nn.relu(-ap + an + margin))


def build_train_step(G, D, g_tx, d_tx, loss, vgg, recon_lambda, style_lambda,
                     perc_lambda, triplet_lambda, margin):
    def train_step(state, batch):
        real, sketch = batch
        rng, ck, tk = jax.random.split(state['rng'], 3)

        real_aug = diff_augment(ck, real, 'color')
        real_s = tps_transform(tk, real_aug)

        gv = {'params': state['G'], 'batch_stats': state['G_bs']}
        (fake, _), _ = G.apply(gv, sketch, real_s, return_qk=True,
                               train=True, mutable=['batch_stats'])
        fake_sg = jax.lax.stop_gradient(fake)
        d_in = lambda img: jnp.concatenate([sketch, img], axis=-1)

        def d_loss_fn(d_params):
            m = {'batch_stats': state['D_bs']}
            (rp, _), m = D.apply({'params': d_params, **m}, d_in(real_aug),
                                 train=True, mutable=['batch_stats'])
            (fp, _), m = D.apply({'params': d_params, **m}, d_in(fake_sg),
                                 train=True, mutable=['batch_stats'])
            return loss.d_loss(rp, fp), m['batch_stats']

        (d_loss, d_bs), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state['D'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D'])
        d_params = optax.apply_updates(state['D'], d_up)

        def g_loss_fn(g_params):
            gm = {'batch_stats': state['G_bs']}
            (fake2, qk_pos), gm = G.apply(
                {'params': g_params, **gm}, sketch, real_s, return_qk=True,
                train=True, mutable=['batch_stats'])
            (_, qk_neg), gm = G.apply(
                {'params': g_params, **gm}, sketch, real_aug, return_qk=True,
                train=True, mutable=['batch_stats'])
            (fp, _), _ = D.apply({'params': d_params, 'batch_stats': d_bs},
                                 d_in(fake2), train=True,
                                 mutable=['batch_stats'])
            g_loss = loss.g_loss(fp)
            if recon_lambda > 0:
                g_loss = g_loss + jnp.mean(jnp.abs(fake2 - real_aug)) \
                    * recon_lambda
            if style_lambda > 0:
                g_loss = g_loss + vgg.style_loss(real_aug, fake2) \
                    * style_lambda
            if perc_lambda > 0:
                g_loss = g_loss + vgg.vgg_loss(real_aug, fake2, (0, 1, 2, 3)) \
                    * perc_lambda
            if triplet_lambda > 0:
                g_loss = g_loss + triplet_loss(
                    qk_pos[0], qk_neg[1], qk_pos[1], margin) * triplet_lambda
            return g_loss, gm['batch_stats']

        (g_loss, g_bs), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state['G'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G'])
        g_params = optax.apply_updates(state['G'], g_up)

        return dict(rng=rng, G=g_params, D=d_params, G_bs=g_bs, D_bs=d_bs,
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(d=jnp.nan_to_num(d_loss), g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    # sketch-input width comes from the CLI (reference SCFT/utils.py:198,203
    # passes sketch_channels into G and D); asserted against the data batch
    sk_ch = int(args.sketch_channels)
    assert sk_ch == test_batch[1].shape[-1], \
        (f'--sketch-channels {sk_ch} does not match the dataset sketch '
         f'channels {test_batch[1].shape[-1]}')
    G = Generator(image_size=args.image_size, in_channels=sk_ch,
                  ref_channels=args.ref_channels,
                  bottom_width=args.bottom_width,
                  enc_channels=args.enc_channels,
                  layer_per_resl=args.layer_per_resl,
                  num_res_blocks=args.num_res_blocks,
                  sn=not args.disable_sn, use_bias=not args.disable_bias,
                  scft_bias=args.enable_scft_bias,
                  norm_name=args.norm_name, act_name=args.act_name,
                  dtype=accel.compute_dtype)
    D = Discriminator(in_channels=sk_ch + args.ref_channels,
                      num_layers=args.num_layers, channels=args.d_channels,
                      sn=not args.disable_sn, use_bias=not args.disable_bias,
                      norm_name=args.norm_name, act_name=args.act_name,
                      dtype=accel.compute_dtype)

    shape = (1, args.image_size, args.image_size)
    g_vars = G.init(keys(), jnp.zeros(shape + (sk_ch,)),
                    jnp.zeros(shape + (args.ref_channels,)))
    d_vars = D.init(keys(), jnp.zeros(shape + (args.ref_channels + sk_ch,)))

    g_tx = optax.adam(args.g_lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.d_lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars['params'], D=d_vars['params'],
                 G_bs=g_vars.get('batch_stats', {}),
                 D_bs=d_vars.get('batch_stats', {}),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    # reference uses VGGLoss(p=1) (utils.py:42)
    vgg = VGGLoss(vgg=16, p=1)
    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, LSGANLoss(), vgg, args.recon_lambda,
        args.style_lambda, args.perc_lambda, args.triplet_lambda,
        args.margin))

    test_real = jnp.asarray(test_batch[0])
    test_sketch = jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        return G.apply({'params': state['G'], 'batch_stats': state['G_bs']},
                       test_sketch, test_real, train=False)

    def sample_fn(state):
        import numpy as np
        sk3 = np.repeat(np.asarray(test_sketch), 3, axis=-1) \
            if test_sketch.shape[-1] == 1 else np.asarray(test_sketch)
        return make_image_grid(sk3, np.asarray(test_real),
                               np.asarray(_gen(state)))

    return run_training(
        name='SCFT', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=6,
        ema_params_path=lambda s: s['G'],
    )


def main(parser):
    # reference add_args schema (utils.py:150-173), verbatim
    parser = add_args(parser, dict(
        num_test=[9, 'number of image for eval'],
        sketch_channels=[1, 'number of channels for sketch images'],
        ref_channels=[3, 'number of channels for reference images'],
        bottom_width=[8, 'bottom width'],
        enc_channels=[16, 'channel width multiplier for encoder/decoder'],
        layer_per_resl=[2, 'number of layers per resolution'],
        num_res_blocks=[7, 'number of residual blocks in G'],
        disable_sn=[False, 'disable spectral norm'],
        disable_bias=[False, 'disable bias'],
        enable_scft_bias=[False, 'enable bias in scft'],
        norm_name=['in', 'normalization layer name'],
        act_name=['lrelu', 'activation function name'],
        num_layers=[3, 'number of layers in D'],
        d_channels=[32, 'channels_width multiplier'],
        d_lr=[0.0002, 'learning rate for D'],
        g_lr=[0.0001, 'learning rate for G'],
        betas=[[0.5, 0.999], 'betas'],
        recon_lambda=[30., 'lambda for reconstruction loss'],
        triplet_lambda=[1., 'lambda for triplet loss'],
        margin=[12., 'margin for triplet loss'],
        perc_lambda=[0.01, 'lambda for percrptual loss'],
        style_lambda=[50., 'lambda for style loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
