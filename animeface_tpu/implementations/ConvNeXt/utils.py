'''ConvNeXt recipe (reference `implementations/ConvNeXt/utils.py`):
non-saturating loss + every-step R1 (reference utils.py:43-46 adds
`gp_fn(real, D) * gp_lambda` each step), optional TTUR (g_lr=lr/2,
d_lr=lr*2, :126), N002 init, EMA sampling.'''

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
    # reference add_args schema (utils.py:78-92), verbatim
    parser = add_args(parser, dict(
        num_test=[16],
        image_channels=[3],
        latent_dim=[128],
        bottom=[4],
        channels=[96],
        max_channels=[int],
        block_type=['convnext'],
        blocks_per_scale=[2],
        lr=[0.0001],
        betas=[[0.5, 0.99]],
        ttur=[False],
        gp_lambda=[10.],
        # constructor knobs the reference hardcodes (model.py:174) —
        # surfaced so smokes can shrink the ConvNeXt-T D
        d_depths=[[3, 3, 9, 3], 'D blocks per stage'],
        d_dims=[[96, 192, 384, 768], 'D dims per stage'],
    ))
    args = parser.parse_args()
    save_args(args)

    loader = build_loader(args, 'image')
    max_iters = default_max_iters(args, loader)

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    G = Generator(latent_dim=args.latent_dim, image_size=args.image_size,
                  bottom=args.bottom, channels=args.channels,
                  max_channels=args.max_channels, block_type=args.block_type,
                  blocks_per_scale=args.blocks_per_scale,
                  out_channels=args.image_channels, dtype=dtype)
    D = Discriminator(in_channels=args.image_channels,
                      depths=tuple(args.d_depths), dims=tuple(args.d_dims),
                      dtype=dtype)

    # TTUR (reference utils.py:126)
    g_lr, d_lr = (args.lr / 2, args.lr * 2) if args.ttur \
        else (args.lr, args.lr)

    run_simple_gan(
        'ConvNeXt', args, loader, max_iters, G, D, NonSaturatingLoss(),
        jnp.zeros((1, args.latent_dim)),
        jnp.zeros((1, args.image_size, args.image_size, args.image_channels)),
        args.latent_dim,
        g_tx=optax.adam(g_lr, b1=args.betas[0], b2=args.betas[1]),
        d_tx=optax.adam(d_lr, b1=args.betas[0], b2=args.betas[1]),
        gp_lambda=args.gp_lambda, gp_every=1,   # reference: R1 every step
        num_test=args.num_test, init_func='N002')
