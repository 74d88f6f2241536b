'''HiT recipe (reference `implementations/HiT/utils.py`): non-saturating +
lazy R1, DiffAugment, optional EMA via the generic adv loop. Arch presets
s/b/l and the 128px trim mirror `set_args_by_arch`/`adjust_by_size`
(reference :105-130); add_args names/defaults mirror :134-152 (`gp_every`
is a TPU-side extra: the reference applies R1 every step when gp_lambda>0,
which the lazy cadence recovers at gp_every=1).'''

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


def set_args_by_arch(args):
    '''reference set_args_by_arch :105-124 (verbatim preset tables).'''
    args.bottom = 8
    args.low_stages = 4
    args.num_heads = [16, 8, 4, 4, 4, 4]
    args.patch_sizes = [4, 4, 8, 8]
    if args.arch == 's':
        args.dims = [512, 256, 128, 64, 32, 32]
        args.num_blocks = [2, 2, 1, 1, 1, 1]
    if args.arch == 'b':
        args.dims = [512, 512, 256, 128, 64, 64]
        args.num_blocks = [2, 2, 2, 2, 2, 2]
    if args.arch == 'l':
        args.dims = [1024, 512, 256, 128, 128, 128]
        args.num_blocks = [2, 2, 2, 2, 2, 2]
    return args


def adjust_by_size(args):
    '''reference adjust_by_size :126-130 (trim one stage at 128px).'''
    if args.image_size == 128:
        args.dims = args.dims[:-1]
        args.num_heads = args.num_heads[:-1]
        args.num_blocks = args.num_blocks[:-1]
    return args


def main(parser):
    parser = add_args(parser, dict(
        num_test=[16, 'number of test images'],
        arch=[str, 'architecture. one of "s", "b" or "l"'],
        latent_dim=[128, 'input latent dim'],
        dims=[[512, 512, 256, 128, 64, 64], 'channel dims per stage'],
        bottom=[8, 'bottom token-grid width'],
        low_stages=[4, 'number of low-res (attention) stages'],
        num_heads=[[16, 8, 4, 4, 4, 4], 'attention heads per stage'],
        num_blocks=[[2, 2, 2, 2, 2, 2], 'blocks per stage'],
        patch_sizes=[[4, 4, 8, 8], 'MAA patch sizes'],
        channels=[32, 'D channel width multiplier'],
        max_channels=[512, 'D maximum channel width'],
        act_name=['lrelu', 'D activation function name'],
        ema=[False, 'use EMA'],
        init_func=['xavier', 'one of "N01", "N002", "xavier" or "kaiming"'],
        lr=[1e-4, 'learning rate'],
        betas=[[0.5, 0.99], 'betas'],
        gp_lambda=[0., 'lambda for gradient penalty'],
        gp_every=[16, 'R1 every N steps (TPU lazy-reg extra)'],
        policy=['color,translation', 'policy for diffaugment'],
    ))
    args = parser.parse_args()
    if args.arch is not None:
        args = set_args_by_arch(args)
    args = adjust_by_size(args)
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
    D = Discriminator(image_size=args.image_size, channels=args.channels,
                      max_channels=args.max_channels, act_name=args.act_name,
                      bottom=min(8, args.image_size // 2), dtype=dtype)

    run_simple_gan(
        'HiT', args, loader, max_iters, G, D, NonSaturatingLoss(),
        jnp.zeros((1, args.latent_dim)),
        jnp.zeros((2, args.image_size, args.image_size, 3)),
        args.latent_dim,
        g_tx=optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
        d_tx=optax.adam(args.lr, b1=args.betas[0], b2=args.betas[1]),
        gp_lambda=args.gp_lambda, gp_every=args.gp_every, policy=args.policy,
        num_test=args.num_test, use_ema=args.ema, init_func=args.init_func)
