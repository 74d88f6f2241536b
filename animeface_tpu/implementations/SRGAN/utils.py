'''SRGAN recipe (reference `implementations/SRGAN/utils.py`): paired LR/HR
training with non-saturating adversarial loss over a multi-scale D + VGG
content loss; eval grid shows LR (upsampled) | HR | G(LR).'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.SRGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args, make_image_grid
from animeface_tpu.nnutils import KeyGen
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.loss.vgg import VGGLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def build_train_step(G, D, g_tx, d_tx, loss, vgg, adv_lambda, vgg_lambda):
    def train_step(state, batch):
        lr, hr = batch
        rng = jax.random.split(state['rng'])[0]

        fake, g_mut = G.apply(state['G'], lr, train=True,
                              mutable=['batch_stats'])
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            d_vars = {'params': d_params, 'batch_stats': state['D']['batch_stats']}
            real_outs, d_mut = D.apply(d_vars, hr, train=True,
                                       mutable=['batch_stats'])
            fake_outs, d_mut = D.apply({'params': d_params, **d_mut}, fake_sg,
                                       train=True, mutable=['batch_stats'])
            d_loss = 0.0
            for (r_log, _), (f_log, _) in zip(real_outs, fake_outs):
                d_loss = d_loss + loss.d_loss(r_log, f_log)
            return d_loss, d_mut

        (d_loss, d_mut), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state['D']['params'])
        d_up, d_opt = d_tx.update(d_grads, state['d_opt'], state['D']['params'])
        d_params = optax.apply_updates(state['D']['params'], d_up)

        def g_loss_fn(g_params):
            fake2, _ = G.apply({'params': g_params, **g_mut}, lr, train=True,
                               mutable=['batch_stats'])
            fake_outs, _ = D.apply({'params': d_params, **d_mut}, fake2,
                                   train=True, mutable=['batch_stats'])
            g_loss = vgg.content_loss(hr, fake2) * vgg_lambda
            for f_log, _ in fake_outs:
                g_loss = g_loss + loss.g_loss(f_log) * adv_lambda
            return g_loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state['G']['params'])
        g_up, g_opt = g_tx.update(g_grads, state['g_opt'], state['G']['params'])
        g_params = optax.apply_updates(state['G']['params'], g_up)

        return dict(rng=rng, G={'params': g_params, **g_mut},
                    D={'params': d_params, **d_mut},
                    g_opt=g_opt, d_opt=d_opt, step=state['step'] + 1), \
            dict(D=jnp.nan_to_num(d_loss), G=jnp.nan_to_num(g_loss))

    return train_step


def train(args, max_iters, loader, test_batch, name='SRGAN'):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    use_bias = not getattr(args, 'disable_bias', False)
    G = Generator(scale=args.scale, image_channels=args.image_channels,
                  channels=args.g_channels, num_blocks=args.num_blocks,
                  sn=not args.disable_sn, act_name=args.g_act_name,
                  norm_name=getattr(args, 'g_norm_name', 'in'),
                  use_bias=use_bias, dtype=accel.compute_dtype)
    D = Discriminator(num_scale=args.num_scale, num_layers=args.num_layers,
                      channels=args.d_channels, sn=not args.disable_sn,
                      act_name=args.d_act_name,
                      norm_name=getattr(args, 'd_norm_name', 'in'),
                      use_bias=use_bias, dtype=accel.compute_dtype)

    lr_size = int(args.image_size // args.scale)
    g_vars = G.init(keys(), jnp.zeros((1, lr_size, lr_size,
                                       args.image_channels)), train=True)
    d_vars = D.init(keys(), jnp.zeros((1, args.image_size, args.image_size,
                                       args.image_channels)), train=True)
    if 'batch_stats' not in g_vars:
        g_vars = {'params': g_vars['params'], 'batch_stats': {}}
    if 'batch_stats' not in d_vars:
        d_vars = {'params': d_vars['params'], 'batch_stats': {}}

    g_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    vgg = VGGLoss(vgg=16)
    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, NonSaturatingLoss(), vgg,
        args.adv_lambda, args.vgg_lambda))

    test_lr, test_hr = jnp.asarray(test_batch[0]), jnp.asarray(test_batch[1])

    @jax.jit
    def _gen(state):
        return G.apply(state['G'], test_lr, train=False)

    def sample_fn(state):
        import numpy as np
        gen = np.asarray(_gen(state))
        up_lr = np.asarray(jax.image.resize(
            test_lr, test_hr.shape, method='nearest'))
        return make_image_grid(up_lr, np.asarray(test_hr), gen)

    return run_training(
        name=name, args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save, nrow=9,
        ema_params_path=lambda s: s['G'],
    )


SRGAN_ARGS = dict(
    num_test=[6, 'number of samples used in eval'],
    scale=[2, 'upsample scale'],
    disable_sn=[False, 'disable spectral norm'],
    disable_bias=[False, 'disable bias'],
    image_channels=[3, 'input image channels'],
    g_channels=[64, 'channel width multiplier for G'],
    num_blocks=[5, 'number of residual blocks in G'],
    g_norm_name=['in', 'normalization layer name for G'],
    g_act_name=['prelu', 'activation function name for G'],
    num_scale=[2, 'number of scales in D'],
    d_channels=[32, 'channel width multiplier for D'],
    num_layers=[3, 'number of layers in D'],
    d_norm_name=['in', 'normalization layer name for D'],
    d_act_name=['prelu', 'activation function name for D'],
    lr=[0.0002, 'learning rate'],
    betas=[[0.5, 0.999], 'betas'],
    adv_lambda=[0.001, 'lambda for adversarial loss'],
    vgg_lambda=[1., 'lambda for perceptual loss'],
)


def main(parser):
    parser = add_args(parser, SRGAN_ARGS)
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'sr')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader, test_batch)
