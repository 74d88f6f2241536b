'''VAN recipe (reference `implementations/VAN/utils.py`): generic adv loop
with non-saturating + every-step R1 (reference utils.py:40-44), optional
TTUR (g_lr=lr/2, d_lr=lr*2, :131), N002 init, EMA sampling.'''

from __future__ import annotations

import jax.numpy as jnp
import optax

from animeface_tpu.implementations.VAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.simple_gan import run_simple_gan
from animeface_tpu.nnutils.trainer import default_max_iters
from animeface_tpu.dataset import build_loader


def main(parser):
    # reference add_args schema (utils.py:80-97), verbatim
    parser = add_args(parser, dict(
        num_test=[16, 'number of samples for eval'],
        image_channels=[3, 'image channels'],
        latent_dim=[128, 'input latent dimension'],
        bottom=[4, 'bottom width'],
        channels=[64, 'channel width'],
        max_channels=[int, 'maximum channel width'],
        blocks_per_scale=[2, 'number of blocks per scale'],
        norm_name=['ln', 'normalization layer name'],
        act_name=['gelu', 'activation function name'],
        layers=[[3, 3, 9, 3], 'layers'],
        lr=[0.0001, 'learning rate'],
        betas=[[0.5, 0.99], 'betas'],
        ttur=[False, 'use TTUR'],
        gp_lambda=[10., 'lambda for gradient penalty'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    G = Generator(latent_dim=args.latent_dim, image_size=args.image_size,
                  bottom=args.bottom, channels=args.channels,
                  max_channels=args.max_channels,
                  blocks_per_scale=args.blocks_per_scale,
                  out_channels=args.image_channels,
                  norm_name=args.norm_name, act_name=args.act_name,
                  dtype=dtype)
    D = Discriminator(layers=tuple(args.layers), channels=args.channels,
                      max_channels=args.max_channels,
                      in_channels=args.image_channels,
                      norm_name=args.norm_name, act_name=args.act_name,
                      dtype=dtype)

    # TTUR (reference utils.py:131)
    g_lr, d_lr = (args.lr / 2, args.lr * 2) if args.ttur \
        else (args.lr, args.lr)

    run_simple_gan(
        'VAN', args, loader, max_iters, G, D, NonSaturatingLoss(),
        jnp.zeros((1, args.latent_dim)),
        jnp.zeros((1, args.image_size, args.image_size, args.image_channels)),
        args.latent_dim,
        g_tx=optax.adam(g_lr, b1=args.betas[0], b2=args.betas[1]),
        d_tx=optax.adam(d_lr, b1=args.betas[0], b2=args.betas[1]),
        gp_lambda=args.gp_lambda, gp_every=1,   # reference: R1 every step
        num_test=args.num_test, init_func='N002')
