'''HiT recipe (reference `implementations/HiT/utils.py`): non-saturating +
lazy R1, DiffAugment, EMA via the generic adv loop.'''

from __future__ import annotations

import math

import jax.numpy as jnp
import optax

from animeface_tpu.implementations.HiT.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.simple_gan import run_simple_gan
from animeface_tpu.nnutils.trainer import default_max_iters
from animeface_tpu.dataset import build_loader


def main(parser):
    parser = add_args(parser, dict(
        latent_dim=[128, 'latent dimension'],
        dims=[[512, 512, 256, 128, 64, 64], 'dims per stage'],
        bottom=[8, 'bottom token-grid width'],
        low_stages=[4, 'number of low-res (attention) stages'],
        num_heads=[[16, 8, 4, 4, 4, 4], 'attention heads per stage'],
        num_blocks=[[2, 2, 2, 2, 2, 2], 'blocks per stage'],
        patch_sizes=[[4, 4, 8, 8], 'MAA patch sizes'],
        d_channels=[32, 'D channel width'],
        lr=[1e-4, 'learning rate'],
        betas=[[0., 0.99], 'betas'],
        gp_lambda=[10., 'lambda for r1'],
        gp_every=[16, 'R1 every N steps'],
        policy=['color,translation', 'DiffAugment policy'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)

    n_stages = int(math.log2(args.image_size) - math.log2(args.bottom)) + 1
    dims = (list(args.dims) + [args.dims[-1]] * n_stages)[:n_stages]
    heads = (list(args.num_heads) + [args.num_heads[-1]] * n_stages)[:n_stages]
    blocks = (list(args.num_blocks) + [args.num_blocks[-1]] * n_stages)[:n_stages]
    low = min(args.low_stages, n_stages - 1)
    patches = (list(args.patch_sizes) + [args.patch_sizes[-1]] * low)[:low]

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    G = Generator(latent_dim=args.latent_dim, dims=tuple(dims),
                  bottom=args.bottom, low_stages=low,
                  num_heads=tuple(heads), num_blocks=tuple(blocks),
                  patch_sizes=tuple(patches), dtype=dtype)
    D = Discriminator(image_size=args.image_size, channels=args.d_channels,
                      bottom=min(8, args.image_size // 2), dtype=dtype)

    run_simple_gan(
        'HiT', args, loader, max_iters, G, D, NonSaturatingLoss(),
        jnp.zeros((1, args.latent_dim)),
        jnp.zeros((2, args.image_size, args.image_size, 3)),
        args.latent_dim,
        g_tx=optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
        d_tx=optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
        gp_lambda=args.gp_lambda, gp_every=args.gp_every, policy=args.policy)
