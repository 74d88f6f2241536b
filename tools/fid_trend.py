'''In-box FID TREND gate over a training run's retained G snapshots.

Scores every `G_<step>.msgpack` in a result directory against the run's
dataset using the fixed-seed random-VGG Frechet distance
(`animeface_tpu.metrics.trend` — see its docstring for why the random
Inception stand-in cannot serve even as a trend signal). Prints one line
per snapshot, writes `trend.json`, and exits non-zero if the GATE fails:
the final snapshot must score strictly better (lower FD) than the first.

    python tools/fid_trend.py --result-dir /tmp/soak_r4/PGGAN/result \
        --model PGGAN --image-size 32 --synthetic-data --cpu

    python tools/fid_trend.py --result-dir .../SOAK/result --model StyleGAN2 \
        --image-size 256 --synthetic-data

    # ADA/StyleGAN3 recipes default latent_dim to 512, not this tool's
    # DCGAN-family default of 100 — pass it explicitly:
    python tools/fid_trend.py --result-dir .../ADA/result --model ADA \
        --image-size 128 --synthetic-data --latent-dim 512

PGGAN snapshots are progressive: each `G_<step>.json` sidecar records the
phase geometry (resolution/depth/mode/alpha) it was saved under; samples
are drawn at that geometry and bilinearly resized to the gate resolution,
so cross-resolution FD values also reflect upsampling blur — expect a step
change at each growth boundary, with the within-resolution trend (and the
first-vs-final gate) being the meaningful signal.

The absolute numbers are NOT FID and must not be compared to published
values; the gate is strictly relative (ARTIFACTS_NEEDED.md covers the real
InceptionV3 artifact).
'''

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pggan_model(args):
    import jax
    import jax.numpy as jnp
    from animeface_tpu.implementations.PGGAN.model import (
        Generator, RESOLUTIONS)

    G = Generator(latent_dim=args.latent_dim,
                  max_depth=RESOLUTIONS.index(args.image_size))
    template = G.init_all(jax.random.PRNGKey(0))['params']

    def make_sample(params, snap_meta):
        depth = snap_meta['depth']
        mode = snap_meta.get('mode', 's')
        alpha = float(snap_meta.get('alpha', 1.0))
        if depth is None:
            depth = RESOLUTIONS.index(args.image_size)

        @jax.jit
        def sample(key):
            z = jax.random.normal(key, (args.batch_size, args.latent_dim))
            imgs = G.apply({'params': params}, z, depth=depth, mode=mode,
                           alpha=jnp.float32(alpha))
            if imgs.shape[1] != args.image_size:
                imgs = jax.image.resize(
                    imgs, (imgs.shape[0], args.image_size, args.image_size,
                           imgs.shape[-1]), 'bilinear')
            return imgs

        return sample

    return template, make_sample


def stylegan2_model(args):
    import jax
    import jax.numpy as jnp
    from animeface_tpu.implementations.StyleGAN2.model import Generator

    G = Generator(image_size=args.image_size, style_dim=args.style_dim,
                  channels=args.channels, max_channels=args.max_channels)
    z0 = jnp.zeros((1, args.style_dim))
    template = G.init({'params': jax.random.PRNGKey(0),
                       'noise': jax.random.PRNGKey(1)}, z0)['params']

    def make_sample(params, snap_meta):
        @jax.jit
        def sample(key):
            zkey, nkey = jax.random.split(key)
            z = jax.random.normal(zkey, (args.batch_size, args.style_dim))
            images, _ = G.apply({'params': params}, z, rngs={'noise': nkey})
            return images

        return sample

    return template, make_sample


def stylegan3_model(args):
    '''StyleGAN3 backbone (also the ADA recipe, which shares it): the
    G_<step>.msgpack artifacts carry {'params': G_ema, 'moments'} — the
    magnitude-EMA input-gain state rides along with the weights.'''
    import jax
    import jax.numpy as jnp
    from animeface_tpu.implementations.StyleGAN3.model import Generator

    G = Generator(image_size=args.image_size, latent_dim=args.latent_dim,
                  num_layers=args.num_layers,
                  map_num_layers=args.map_num_layers,
                  channels=args.channels, max_channels=args.max_channels,
                  style_dim=args.style_dim)
    v = G.init({'params': jax.random.PRNGKey(0)},
               jnp.zeros((1, args.latent_dim)))
    template = {'params': v['params'], 'moments': v['moments']}

    def make_sample(params, snap_meta):
        @jax.jit
        def sample(key):
            z = jax.random.normal(key, (args.batch_size, args.latent_dim))
            return G.apply(params, z)

        return sample

    return template, make_sample


MODELS = {'PGGAN': pggan_model, 'StyleGAN2': stylegan2_model,
          'StyleGAN3': stylegan3_model, 'ADA': stylegan3_model}


def main():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--result-dir', required=True)
    p.add_argument('--model', default='PGGAN', choices=sorted(MODELS))
    p.add_argument('--image-size', type=int, required=True)
    p.add_argument('--num-samples', type=int, default=1024)
    p.add_argument('--batch-size', type=int, default=128)
    p.add_argument('--num-images', type=int, default=4096,
                   help='synthetic dataset size for the reference stats')
    p.add_argument('--synthetic-data', action='store_true')
    p.add_argument('--data-root', default=None)
    p.add_argument('--dataset', default='animeface')
    p.add_argument('--latent-dim', type=int, default=100)
    p.add_argument('--style-dim', type=int, default=512)
    p.add_argument('--channels', type=int, default=32)
    p.add_argument('--max-channels', type=int, default=512)
    p.add_argument('--num-layers', type=int, default=14,
                   help='StyleGAN3 synthesis depth')
    p.add_argument('--map-num-layers', type=int, default=2,
                   help='StyleGAN3 mapping depth')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/animeface_jax_cache'
                      + ('_cpu' if args.cpu else ''))

    import numpy as np
    from animeface_tpu.utils import EasyDict
    from animeface_tpu.checkpoint import load_model
    from animeface_tpu.dataset import build_loader
    from animeface_tpu.metrics.trend import (
        make_trend_extractor, trend_statistics, trend_fd)

    snaps = []
    for path in glob.glob(os.path.join(args.result_dir, 'G_*.msgpack')):
        m = re.match(r'G_(\d+)\.msgpack$', os.path.basename(path))
        if m:
            snaps.append((int(m.group(1)), path))
    snaps.sort()
    if len(snaps) < 2:
        print(f'need >= 2 numbered snapshots in {args.result_dir}, '
              f'found {len(snaps)}', file=sys.stderr)
        sys.exit(2)

    loader_args = EasyDict(
        dataset=args.dataset, data_root=args.data_root,
        synthetic_data=args.synthetic_data, image_size=args.image_size,
        batch_size=args.batch_size, min_year=None,
        num_images=args.num_images, seed=args.seed)
    loader = build_loader(loader_args, 'image')

    def real_stream():
        while True:
            yield from loader

    extract = make_trend_extractor()
    ref_stats = trend_statistics(real_stream(), extract,
                                 max_samples=args.num_samples)

    template, make_sample = MODELS[args.model](args)

    results = []
    for step, path in snaps:
        meta_path = path.replace('.msgpack', '.json')
        snap_meta = dict(depth=None, mode='s', alpha=1.0)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                snap_meta.update(json.load(f))
        params = load_model(path, template)
        sample = make_sample(params, snap_meta)

        def fake_stream():
            key = jax.random.PRNGKey(args.seed + 1)
            while True:
                key, sub = jax.random.split(key)
                yield np.asarray(sample(sub))

        fd = trend_fd(ref_stats, trend_statistics(
            fake_stream(), extract, max_samples=args.num_samples))
        results.append(dict(step=step, fd=fd, **{
            k: snap_meta[k] for k in ('resolution', 'alpha')
            if k in snap_meta}))
        print(f'[trend] step {step:>7}  fd {fd:12.4f}  '
              f'{snap_meta.get("resolution", args.image_size)}px '
              f'alpha {snap_meta.get("alpha", 1.0):.2f}', flush=True)

    gate_ok = bool(results[-1]['fd'] < results[0]['fd'])
    out = dict(metric='random-vgg frechet trend (relative only)',
               gate='final snapshot fd < first snapshot fd',
               gate_ok=gate_ok, results=results)
    out_path = os.path.join(args.result_dir, 'trend.json')
    with open(out_path, 'w') as f:
        json.dump(out, f, indent=1)
    print(f'[trend] gate {"OK" if gate_ok else "FAILED"} '
          f'({results[0]["fd"]:.4f} -> {results[-1]["fd"]:.4f}); '
          f'wrote {out_path}')
    sys.exit(0 if gate_ok else 1)


if __name__ == '__main__':
    main()
