'''TransGAN recipe (reference `implementations/TransGAN/utils.py`):
non-saturating + lazy R1, DiffAugment, EMA, generic adv loop.'''

from __future__ import annotations

import jax.numpy as jnp
import optax

from animeface_tpu.implementations.TransGAN.model import Generator, Discriminator
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils.loss import NonSaturatingLoss
from animeface_tpu.nnutils.simple_gan import run_simple_gan
from animeface_tpu.nnutils.trainer import default_max_iters
from animeface_tpu.nnutils.accelerate import Accelerator
from animeface_tpu.dataset import build_loader


def main(parser):
    parser = add_args(parser, dict(
        latent_dim=[256, 'latent dimension'],
        g_depths=[[5, 4, 2], 'transformer blocks per resolution'],
        bottom_width=[8, 'initial token grid width'],
        embed_dim=[384, 'embedding dimension'],
        num_heads=[4, 'attention heads'],
        d_depth=[7, 'encoder blocks in D'],
        patch_size=[8, 'D patch size'],
        lr=[1e-5, 'learning rate'],
        betas=[[0., 0.99], 'betas'],
        gp_lambda=[10., 'lambda for r1'],
        gp_every=[16, 'R1 every N steps'],
        policy=['color,translation', 'DiffAugment policy'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)

    need = Generator.depths_len_from_target_width(args.image_size,
                                                  args.bottom_width)
    depths = list(args.g_depths)
    while len(depths) < need:
        depths.append(depths[-1])
    depths = depths[:need]

    accel_dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    G = Generator(depths=tuple(depths), latent_dim=args.latent_dim,
                  bottom_width=args.bottom_width, embed_dim=args.embed_dim,
                  num_heads=args.num_heads, dtype=accel_dtype)
    D = Discriminator(depth=args.d_depth, image_size=args.image_size,
                      patch_size=args.patch_size, embed_dim=args.embed_dim,
                      num_heads=args.num_heads, dtype=accel_dtype)

    run_simple_gan(
        'TransGAN', args, loader, max_iters, G, D, NonSaturatingLoss(),
        jnp.zeros((1, args.latent_dim)),
        jnp.zeros((1, args.image_size, args.image_size, 3)),
        args.latent_dim,
        g_tx=optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
        d_tx=optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
        gp_lambda=args.gp_lambda, gp_every=args.gp_every, policy=args.policy)
