'''Restormer recipe (reference `implementations/Restormer/utils.py`): shares
the NAFNet line->image restoration loop (LSGAN + pixel L1).'''

from __future__ import annotations

import jax.numpy as jnp

from animeface_tpu.implementations.Restormer.model import (
    Generator, Discriminator,
)
from animeface_tpu.implementations.NAFNet.utils import run_restoration
from animeface_tpu.utils import add_args, save_args
from animeface_tpu.nnutils.trainer import default_max_iters
from animeface_tpu.dataset import build_dataset, DataLoader


def main(parser):
    parser = add_args(parser, dict(
        num_test=[4, 'eval samples'],
        bottom=[16, 'bottom width'],
        g_channels=[48, 'minimum channel width'],
        blocks_per_scale=[2, 'transformer blocks per scale'],
        mid_blocks=[4, 'blocks at the bottom'],
        num_heads=[4, 'MDTA heads'],
        num_layers=[3, 'D layers'],
        d_channels=[64, 'D channel width'],
        max_channels=[512, 'max channels'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        pixel_lambda=[10., 'lambda for pixel L1'],
    ))
    args = parser.parse_args()
    save_args(args)

    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    line_ch = int(test_batch[1].shape[-1])
    G = Generator(image_size=args.image_size, bottom=args.bottom,
                  channels=args.g_channels,
                  blocks_per_scale=args.blocks_per_scale,
                  mid_blocks=args.mid_blocks, num_heads=args.num_heads,
                  in_channels=line_ch, dtype=dtype)
    D = Discriminator(num_layers=args.num_layers, channels=args.d_channels,
                      max_channels=args.max_channels, dtype=dtype)
    run_restoration('Restormer', args, G, D, loader, test_batch, max_iters)
