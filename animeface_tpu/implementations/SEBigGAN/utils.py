'''SEBigGAN recipe: the BigGAN loop (hinge, EMA, DiffAugment) with SE-gated
blocks (reference `implementations/original/SEBigGAN`).'''

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from animeface_tpu.implementations.SEBigGAN.model import Generator, Discriminator
from animeface_tpu.implementations.BigGAN.utils import build_train_step
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils import KeyGen, sample_nnoise
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.nnutils.loss import HingeLoss
from animeface_tpu.nnutils.trainer import run_training, default_max_iters
from animeface_tpu.dataset import build_loader


def train(args, max_iters, loader):
    accel = Accelerator(mesh_shape=tuple(args.mesh), bf16=not args.no_bf16)
    keys = KeyGen(args.seed)

    G = Generator(image_size=args.image_size, z_dim=args.z_dim,
                  channels=args.channels, dtype=accel.compute_dtype)
    D = Discriminator(image_size=args.image_size, channels=args.channels,
                      dtype=accel.compute_dtype)

    g_vars = G.init(keys(), jnp.zeros((2, args.z_dim)), train=True)
    d_vars = D.init(keys(), jnp.zeros((2, args.image_size, args.image_size, 3)),
                    train=True)

    g_tx = optax.adam(args.g_lr, b1=args.betas[0], b2=args.betas[1])
    d_tx = optax.adam(args.d_lr, b1=args.betas[0], b2=args.betas[1])
    state = dict(rng=keys(), G=g_vars, D=d_vars,
                 G_ema=jax.tree_util.tree_map(jnp.copy, g_vars),
                 g_opt=g_tx.init(g_vars['params']),
                 d_opt=d_tx.init(d_vars['params']), step=jnp.int32(0))

    train_step = accel.jit_step(build_train_step(
        G, D, g_tx, d_tx, HingeLoss(), args.policy))

    const_z = sample_nnoise(keys(), (16, args.z_dim))

    @jax.jit
    def sample_fn(state):
        return G.apply(state['G_ema'], const_z, train=False)

    return run_training(
        name='SEBigGAN', args=args, accel=accel, state=state, loader=loader,
        train_step=train_step, sample_fn=sample_fn,
        max_iters=max_iters, save_interval=args.save,
        ema_params_path=lambda s: s['G_ema'],
    )


def main(parser):
    parser = add_args(parser, dict(
        z_dim=[120, 'latent dimension'],
        channels=[64, 'channel width'],
        g_lr=[5e-5, 'G learning rate'],
        d_lr=[2e-4, 'D learning rate'],
        betas=[[0., 0.999], 'betas'],
        policy=['color,translation', 'DiffAugment policy'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)
    train(args, max_iters, loader)
