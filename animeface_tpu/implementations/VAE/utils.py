'''VAE recipe (reference `implementations/VAE/utils.py`): sum-MSE
reconstruction + KL divergence, Adam(lr, (beta1, beta2)).'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.VAE.model import VAE
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def kl_divergence(mu, logvar):
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))


def build_train_step(model, tx):
    def train_step(state, batch):
        rng, rkey = jax.random.split(state['rng'])

        def loss_fn(params):
            (recons, z, mu, logvar), new_bs = model.apply(
                {'params': params, 'batch_stats': state['batch_stats']},
                batch, rngs={'reparam': rkey}, mutable=['batch_stats'])
            recons_loss = jnp.sum((recons - batch) ** 2)
            kld = kl_divergence(mu, logvar)
            return recons_loss + kld, new_bs['batch_stats']

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state['params'])
        up, opt = tx.update(grads, state['opt'], state['params'])
        params = optax.apply_updates(state['params'], up)
        return dict(rng=rng, params=params, opt=opt, batch_stats=batch_stats,
                    step=state['step'] + 1), \
            dict(loss=jnp.nan_to_num(loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    model = VAE(image_size=args.image_size, z_dim=args.z_dim,
                image_channels=args.image_channels, channels=args.channels,
                max_channels=args.max_channels,
                enc_target_resl=args.enc_target_resl,
                use_bias=not args.disable_bias, norm_name=args.norm_name,
                act_name=args.act_name, dtype=accel.compute_dtype)
    variables = model.init(
        {'params': keys(), 'reparam': keys()},
        jnp.zeros((1, args.image_size, args.image_size, args.image_channels)))
    batch_stats = variables.get('batch_stats', {})

    tx = optax.adam(args.lr, b1=args.beta1, b2=args.beta2)
    state = dict(rng=keys(), params=variables['params'],
                 opt=tx.init(variables['params']), batch_stats=batch_stats,
                 step=jnp.int32(0))
    train_step = accel.jit_step(build_train_step(model, tx))

    const_z = sample_nnoise(keys(), (args.test_images, args.z_dim))

    @jax.jit
    def sample_fn(state):
        return model.apply(
            {'params': state['params'], 'batch_stats': state['batch_stats']},
            const_z, method=VAE.decode, mutable=['batch_stats'])[0]

    return run_training(
        name='VAE', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['params'],
    )


def main(parser):
    # reference add_args schema (utils.py:94-107), verbatim
    parser = add_args(parser, dict(
        image_channels=[3, 'number of channels in input images'],
        z_dim=[256, 'dimension of extracted feature vector z'],
        channels=[32, 'channel width multiplier'],
        max_channels=[1024, 'maximum channels'],
        enc_target_resl=[4, 'resolution to dwonsample to before faltten'],
        disable_bias=[False, 'do not use bias'],
        norm_name=['bn', 'normalization layer name'],
        act_name=['relu', 'activation function name'],
        lr=[0.0002, 'learning rate'],
        beta1=[0.9, 'beta1'],
        beta2=[0.999, 'beta2'],
        test_images=[16, 'number of images for evaluation'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
