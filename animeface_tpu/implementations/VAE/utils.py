'''VAE recipe (reference `implementations/VAE/utils.py`): sum-MSE
reconstruction + KL divergence, Adam(2e-4).'''

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
            recons, z, mu, logvar = model.apply({'params': params}, batch,
                                                rngs={'reparam': rkey})
            recons_loss = jnp.sum((recons - batch) ** 2)
            kld = kl_divergence(mu, logvar)
            return recons_loss + kld

        loss, grads = jax.value_and_grad(loss_fn)(state['params'])
        up, opt = tx.update(grads, state['opt'], state['params'])
        params = optax.apply_updates(state['params'], up)
        return dict(rng=rng, params=params, opt=opt,
                    step=state['step'] + 1), \
            dict(loss=jnp.nan_to_num(loss))

    return train_step


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    model = VAE(image_size=args.image_size, z_dim=args.z_dim,
                image_channels=args.image_channels, channels=args.channels,
                max_channels=args.max_channels, dtype=accel.compute_dtype)
    variables = model.init(
        {'params': keys(), 'reparam': keys()},
        jnp.zeros((1, args.image_size, args.image_size, args.image_channels)))

    tx = optax.adam(args.lr)
    state = dict(rng=keys(), params=variables['params'],
                 opt=tx.init(variables['params']), step=jnp.int32(0))
    train_step = accel.jit_step(build_train_step(model, tx))

    const_z = sample_nnoise(keys(), (16, args.z_dim))

    @jax.jit
    def sample_fn(state):
        return model.apply({'params': state['params']}, const_z,
                           method=VAE.decode)

    return run_training(
        name='VAE', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['params'],
    )


def main(parser):
    parser = add_args(parser, dict(
        z_dim=[256, 'latent dimension'],
        image_channels=[3, 'image channels'],
        channels=[32, 'channel width'],
        max_channels=[512, 'maximum channels'],
        lr=[0.0002, 'learning rate'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
