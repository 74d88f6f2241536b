'''SPADE recipe (reference `implementations/SPADE/utils.py:31-117,151-183`):
hinge loss over multi-scale D on (lineart ‖ image), feature matching +
optional VAE encoder KL; TTUR swaps betas to (0, 0.9) and splits lr
(reference :245-249). add_args mirrors the reference schema.'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.SPADE.model import (
    Generator, Discriminator, Encoder,
)
from animeface_tpu.implementations.pix2pixHD.utils import feature_matching
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen, sample_nnoise, apply_mutable
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import HingeLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, E, g_tx, d_tx, loss, feat_lambda, kld_lambda,
                     z_dim):
    use_e = E is not None

    def train_step(state, batch):
        image, seg = batch
        rng, zkey, ekey = jax.random.split(state['rng'], 3)
        B = image.shape[0]
        d_in = lambda x: jnp.concatenate([x, seg], axis=-1)
        g_extra = {k: v for k, v in state['G'].items() if k != 'params'}
        e_extra = ({k: v for k, v in state['E'].items() if k != 'params'}
                   if use_e else {})

        def gen(g_params, e_params):
            if use_e:
                (z, mu, logvar), e_mut = apply_mutable(
                    E, e_params, e_extra, image, ekey, train=True)
            else:
                z = sample_nnoise(zkey, (B, z_dim))
                mu = logvar = None
                e_mut = {}
            (fake), g_mut = apply_mutable(G, g_params, g_extra, z, seg,
                                       train=True)
            return fake, mu, logvar, g_mut, e_mut

        fake, _, _, _, _ = gen(state['G']['params'],
                               state['E']['params'] if use_e else None)
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
            fake2, mu, logvar, g_mut, e_mut = gen(g_params, e_params)
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
            if use_e and kld_lambda > 0:
                kld = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
                g_loss = g_loss + kld * kld_lambda
            return g_loss, (g_mut, e_mut)

        params = (state['G']['params'],
                  state['E']['params'] if use_e else None)
        (g_loss, (g_mut, e_mut)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(params)
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], params)
        g_params, e_params = optax.apply_updates(params, g_up)

        new_state = dict(rng=rng, G={'params': g_params, **g_mut},
                         D={'params': d_params, **d_mut},
                         g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1)
        if use_e:
            new_state['E'] = {'params': e_params, **e_mut}
        return new_state, dict(d=jnp.nan_to_num(d_loss),
                               g=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    # seg-input width comes from the CLI (reference SPADE/utils.py:217,223
    # passes line_channels into G and D); asserted against the data batch
    seg_ch = int(args.line_channels)
    assert seg_ch == test_batch[1].shape[-1], \
        (f'--line-channels {seg_ch} does not match the dataset line-art '
         f'channels {test_batch[1].shape[-1]}')
    G = Generator(image_size=args.image_size, z_dim=args.z_dim,
                  in_channels=seg_ch, out_channels=args.rgb_channels,
                  channels=args.channels, max_channels=args.max_channels,
                  block_num_conv=args.block_num_conv,
                  spade_hidden_channels=args.spade_hidden_channels,
                  norm_name=args.g_norm_name, act_name=args.g_act_name,
                  use_sn=not args.g_disable_sn,
                  use_bias=not args.g_disable_bias,
                  dtype=accel.compute_dtype)
    D = Discriminator(num_scale=args.num_scale, num_layers=args.num_layers,
                      channels=args.channels, sn=not args.d_disable_sn,
                      act_name=args.d_act_name,
                      use_bias=not args.d_disable_bias,
                      dtype=accel.compute_dtype)
    E = None if args.no_encoder else Encoder(
        image_size=args.image_size, z_dim=args.z_dim,
        target_resl=args.target_resl, channels=args.channels,
        norm_name=args.e_norm_name, act_name=args.e_act_name,
        use_sn=not args.e_disable_sn, use_bias=not args.e_disable_bias,
        dtype=accel.compute_dtype)

    shape = (2, args.image_size, args.image_size)
    g_vars = G.init(keys(), jnp.zeros((2, args.z_dim)),
                    jnp.zeros(shape + (seg_ch,)))
    d_vars = D.init(keys(), jnp.zeros(shape + (args.rgb_channels + seg_ch,)),
                    train=True)
    if 'batch_stats' not in d_vars:
        d_vars = {'params': d_vars['params'], 'batch_stats': {}}
    e_vars = None if E is None else E.init(
        keys(), jnp.zeros(shape + (args.rgb_channels,)), keys())

    if args.ttur:   # reference :245-249
        g_lr, d_lr = args.lr / 2, args.lr * 2
        betas = (0., 0.9)
    else:
        g_lr, d_lr = args.lr, args.lr
        betas = (args.beta1, args.beta2)
    g_tx = optax.adam(g_lr, b1=betas[0], b2=betas[1])
    d_tx = optax.adam(d_lr, b1=betas[0], b2=betas[1])
    g_opt_params = (g_vars['params'], None if E is None else e_vars['params'])
    state = dict(rng=keys(), G=dict(g_vars), D=d_vars,
                 g_opt=g_tx.init(g_opt_params),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))
    if E is not None:
        state['E'] = dict(e_vars)

    kld_lambda = 0.0 if args.no_encoder else args.kld_lambda  # ref :241
    train_step = accel.jit_step(build_train_step(
        G, D, E, g_tx, d_tx, HingeLoss(), args.feat_lambda,
        kld_lambda, args.z_dim))

    test_image = jnp.asarray(test_batch[0])
    test_seg = jnp.asarray(test_batch[1])
    const_z = sample_nnoise(keys(), (test_seg.shape[0], args.z_dim))

    @jax.jit
    def _gen(state):
        return G.apply({'params': state['G']['params'],
                        **{k: v for k, v in state['G'].items()
                           if k != 'params'}},
                       const_z, test_seg, train=False)

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
        line_channels=[1, 'number of channels of line art images'],
        rgb_channels=[3, 'number of channels of the generated images'],
        test_images=[6, 'number of images for test'],
        z_dim=[256, 'number of dimensions for input z'],
        channels=[32, 'channel width multiplier'],
        max_channels=[1024, 'maximum number of channels'],
        block_num_conv=[2, 'number of convolution layers per residual block'],
        spade_hidden_channels=[128, 'number of channels in SPADE hidden '
                                    'layers'],
        g_norm_name=['bn', 'normalization layer name of G'],
        g_act_name=['lrelu', 'activation function name of G'],
        g_disable_bias=[False, 'do not use bias in G'],
        g_disable_sn=[False, 'do not use spectral normalization in G'],
        num_scale=[2, 'number of scales to discriminate'],
        num_layers=[3, 'number of layers in D'],
        d_norm_name=['bn', 'normalization layer name of D'],
        d_act_name=['lrelu', 'activation function name of D'],
        d_disable_bias=[False, 'do not use bias in D (fixed: biased convs '
                               'in the shared patch D)'],
        d_disable_sn=[False, 'do not use spectral normalization in D'],
        no_encoder=[False, 'do not use encoder'],
        target_resl=[4, 'to what resolution down-sample to before FC layers '
                        'in E'],
        e_norm_name=['bn', 'normalization layer name of E'],
        e_act_name=['lrelu', 'activation function name of E'],
        e_disable_bias=[False, 'do not use bias in E'],
        e_disable_sn=[False, 'do not use spectral normalization in E'],
        lr=[0.0002, 'learning rate'],
        beta1=[0.5, 'beta1'],
        beta2=[0.999, 'beta2'],
        ttur=[False, 'use TTUR'],
        kld_lambda=[0.05, 'lambda for KL divergence'],
        feat_lambda=[10., 'lambda for feature matching loss'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.test_images,
                                      shuffle=False, num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
