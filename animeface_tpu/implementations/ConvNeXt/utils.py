'''ConvNeXt recipe (reference `implementations/ConvNeXt/utils.py`):
non-saturating + lazy R1 via the generic adv loop.'''

from __future__ import annotations

import jax.numpy as jnp
import optax

from animeface_tpu.implementations.ConvNeXt.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.simple_gan import run_simple_gan
from animeface_tpu.nnutils.trainer import default_max_iters
from animeface_tpu.dataset import build_loader


def main(parser):
    parser = add_args(parser, dict(
        latent_dim=[128, 'latent dimension'],
        channels=[96, 'G channel width'],
        blocks_per_scale=[2, 'ConvNeXt blocks per scale'],
        d_depths=[[3, 3, 9, 3], 'D blocks per stage'],
        d_dims=[[96, 192, 384, 768], 'D dims per stage'],
        lr=[2e-4, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        gp_lambda=[10., 'lambda for r1'],
        gp_every=[16, 'R1 every N steps'],
        policy=['color,translation', 'DiffAugment policy'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    G = Generator(latent_dim=args.latent_dim, image_size=args.image_size,
                  channels=args.channels,
                  blocks_per_scale=args.blocks_per_scale, dtype=dtype)
    D = Discriminator(depths=tuple(args.d_depths), dims=tuple(args.d_dims),
                      dtype=dtype)

    run_simple_gan(
        'ConvNeXt', args, loader, max_iters, G, D, NonSaturatingLoss(),
        jnp.zeros((1, args.latent_dim)),
        jnp.zeros((1, args.image_size, args.image_size, 3)),
        args.latent_dim,
        g_tx=optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
        d_tx=optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
        gp_lambda=args.gp_lambda, gp_every=args.gp_every, policy=args.policy)
