'''Restormer recipe (reference `implementations/Restormer/utils.py:145-167`):
shares the NAFNet line->image restoration loop (LSGAN + pixel L1).
add_args names/defaults mirror the reference schema; `g_norm_name`/
`g_act_name` are fixed to their ln/gelu defaults in the TPU model (the
reference never varies them either) and accepted-but-unused for CLI parity;
`randomize_xdog` is handled at dataset build time.'''

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
        num_blocks=[[2, 6, 6, 8], 'transformer blocks per scale'],
        num_heads=[[1, 2, 4, 8], 'attention heads per scale'],
        num_refinement_blocks=[4, 'transformer blocks in refinement'],
        ff_expansion=[2.66, 'feed forward expansion ratio'],
        g_channels=[48, 'minimum channel width'],
        g_norm_name=['ln', 'normalization layer name (fixed: ln)'],
        g_act_name=['gelu', 'activation layer name (fixed: gelu)'],
        skip_input=[False, 'if true skip connect input to output'],
        num_layers=[3, 'D layers'],
        d_channels=[64, 'D channel width'],
        max_channels=[512, 'max channels'],
        lr=[0.0002, 'learning rate'],
        betas=[[0.5, 0.999], 'betas'],
        pixel_lambda=[10., 'lambda for pixel L1'],
        randomize_xdog=[False, 'use random xdog parameters'],
    ))
    args = parser.parse_args()
    save_args(args)

    if args.randomize_xdog:
        # the TPU input pipeline consumes PREcomputed xdog files (native
        # decode path) rather than re-running xdog per sample like the
        # reference; randomized params are applied at preprocessing time.
        import warnings
        warnings.warn('--randomize-xdog: randomize via tools/preprocess/'
                      'xdog.py when generating the xdog set; the training '
                      'loader uses precomputed files')
    dataset = build_dataset(args, 'xdog')
    loader = DataLoader(dataset, args.batch_size, seed=args.seed)
    test_batch = next(iter(DataLoader(dataset, args.num_test, shuffle=False,
                                      num_workers=1)))
    max_iters = default_max_iters(args, loader)

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    line_ch = int(test_batch[1].shape[-1])
    G = Generator(num_blocks=tuple(args.num_blocks),
                  num_heads=tuple(args.num_heads),
                  num_refinement_blocks=args.num_refinement_blocks,
                  ff_expansion=args.ff_expansion,
                  channels=args.g_channels, skip_input=args.skip_input,
                  in_channels=line_ch, dtype=dtype)
    D = Discriminator(num_layers=args.num_layers, channels=args.d_channels,
                      max_channels=args.max_channels, dtype=dtype)
    run_restoration('Restormer', args, G, D, loader, test_batch, max_iters)
