'''FID-50k CLI: generated samples from a trained G vs a dataset.

    python -m animeface_tpu.metrics.fid_cli \
        --model StyleGAN2 --weights path/to/G_50000.msgpack \
        --dataset animeface --image-size 256 --num-samples 50000

Requires ANIMEFACE_INCEPTION_WEIGHTS (see tools/convert_inception_weights.py).

Pipeline scale is demonstrated end to end in this zero-egress container:
the full 50k-real + 50k-fake run (64px, batch 256, one v5e chip) completes
in ~35 min wall — G sampling + InceptionV3 forwards + streaming f64 stats +
Frechet solve, bounded memory. Caveat measured here: with the fixed-seed
RANDOM-INIT Inception stand-in the 2048-d features collapse to near
constants (std ~3e-6 — untrained BN stacks are contractive), so FID/KID
read 0.0 for ANY pair of streams; real numbers require the converted
pytorch-fid checkpoint (the math itself is pinned against committed canned
features in tests/test_metrics.py).
'''

from __future__ import annotations

import argparse

import numpy as np


def generator_batches(sample_fn, num_samples: int, batch_size: int, seed: int):
    import jax
    key = jax.random.PRNGKey(seed)
    n = 0
    while n < num_samples:
        key, sub = jax.random.split(key)
        yield np.asarray(sample_fn(sub))
        n += batch_size


def main():
    p = argparse.ArgumentParser(description='FID-50k harness')
    p.add_argument('--model', default='StyleGAN2',
                   help='implementation name (StyleGAN2 supported natively)')
    p.add_argument('--weights', required=True, help='G params .msgpack')
    p.add_argument('--dataset', default='animeface')
    p.add_argument('--data-root', default=None)
    p.add_argument('--image-size', type=int, default=256)
    p.add_argument('--num-samples', type=int, default=50_000)
    p.add_argument('--batch-size', type=int, default=64)
    p.add_argument('--style-dim', type=int, default=512)
    p.add_argument('--channels', type=int, default=32)
    p.add_argument('--max-channels', type=int, default=512)
    p.add_argument('--map-num-layers', type=int, default=8,
                   help='mapping depth (8 for the published checkpoint)')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--kid', action='store_true', help='also report KID')
    p.add_argument('--synthetic-data', action='store_true',
                   help='real stream from the procedural synthetic dataset '
                        '(runbook dry-run / no datasets mounted)')
    args = p.parse_args()

    import os

    import jax
    # honor ANIMEFACE_PLATFORM like main.py (the axon sitecustomize overrides
    # JAX_PLATFORMS, so a config update after import is the only way to force
    # CPU — e.g. the runbook dry-run while the chip is busy)
    platform = os.environ.get('ANIMEFACE_PLATFORM')
    if platform:
        jax.config.update('jax_platforms', platform)
    import jax.numpy as jnp
    from animeface_tpu.utils import EasyDict
    from animeface_tpu.checkpoint import load_model
    from animeface_tpu.dataset import build_loader
    from animeface_tpu.metrics import compute_fid, make_extractor

    from animeface_tpu.implementations.StyleGAN2.model import Generator
    G = Generator(image_size=args.image_size, style_dim=args.style_dim,
                  channels=args.channels, max_channels=args.max_channels,
                  map_num_layers=args.map_num_layers, dtype=jnp.bfloat16)
    z0 = jnp.zeros((1, args.style_dim))
    template = G.init({'params': jax.random.PRNGKey(0),
                       'noise': jax.random.PRNGKey(1)}, z0)['params']
    params = load_model(args.weights, template)

    @jax.jit
    def sample_fn(key):
        zkey, nkey = jax.random.split(key)
        z = jax.random.normal(zkey, (args.batch_size, args.style_dim))
        images, _ = G.apply({'params': params}, z, rngs={'noise': nkey})
        return images

    loader_args = EasyDict(
        dataset=args.dataset, data_root=args.data_root,
        synthetic_data=args.synthetic_data,
        image_size=args.image_size, batch_size=args.batch_size,
        min_year=None, num_images=None, seed=args.seed)
    loader = build_loader(loader_args, 'image')

    def real_stream():
        while True:
            yield from loader

    extract = make_extractor()
    fid = compute_fid(real_stream(),
                      generator_batches(sample_fn, args.num_samples,
                                        args.batch_size, args.seed),
                      extract, num_samples=args.num_samples, verbose=True)
    print(f'FID-{args.num_samples // 1000}k: {fid:.4f}')

    if args.kid:
        # KID needs raw feature matrices; cap at the StyleGAN2-ADA default
        # subset budget (100 x 1000) per stream
        from animeface_tpu.metrics.fid import _feature_stream, compute_kid
        n_kid = min(args.num_samples, 10_000)
        real_f = np.concatenate(list(_feature_stream(
            real_stream(), extract, n_kid)))
        fake_f = np.concatenate(list(_feature_stream(
            generator_batches(sample_fn, n_kid, args.batch_size,
                              args.seed + 1), extract, n_kid)))
        kid = compute_kid(real_f, fake_f,
                          subset_size=min(1000, n_kid), seed=args.seed)
        print(f'KID-{n_kid // 1000}k: {kid:.6f}')


if __name__ == '__main__':
    main()
