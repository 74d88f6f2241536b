'''Inference from saved weights (reference weights.md flow: build the
Generator with the published hyperparams, load weights, sample).

    python tools/generate.py --weights result/G_50000.msgpack --num 16 \
        --out samples.png [--image-size 256] [--seed 0] [--truncation 0.7] \
        [--mix-seed 1 --mix-layer 8]

Style mixing follows the reference's (z1, z2) contract
(implementations/StyleGAN2/model.py:352-358): layers >= --mix-layer take the
second seed's style.
'''

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', default='StyleGAN2', choices=['StyleGAN2'],
                   help='generator family (covers ADA/APA/DiffAugment weights)')
    p.add_argument('--weights', required=True)
    p.add_argument('--num', type=int, default=16)
    p.add_argument('--out', default='samples.png')
    p.add_argument('--image-size', type=int, default=256)
    p.add_argument('--style-dim', type=int, default=512)
    p.add_argument('--channels', type=int, default=32)
    p.add_argument('--max-channels', type=int, default=512)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--truncation', type=float, default=1.0,
                   help='w-space truncation toward the mean style')
    p.add_argument('--mix-seed', type=int, default=None,
                   help='second seed for style mixing')
    p.add_argument('--mix-layer', type=int, default=8,
                   help='first layer taking the second style')
    p.add_argument('--nrow', type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from animeface_tpu.checkpoint import load_model
    from animeface_tpu.utils import save_image
    from animeface_tpu.implementations.StyleGAN2.model import Generator

    G = Generator(image_size=args.image_size, style_dim=args.style_dim,
                  channels=args.channels, max_channels=args.max_channels,
                  dtype=jnp.bfloat16)
    zkey, nkey = jax.random.split(jax.random.PRNGKey(args.seed))
    template = G.init({'params': jax.random.PRNGKey(0),
                       'noise': jax.random.PRNGKey(1)},
                      jnp.zeros((1, args.style_dim)))['params']
    params = load_model(args.weights, template)

    z = jax.random.normal(zkey, (args.num, args.style_dim))

    if args.mix_seed is not None:
        z2 = jax.random.normal(jax.random.PRNGKey(args.mix_seed),
                               (args.num, args.style_dim))
        images, _ = G.apply({'params': params}, (z, z2),
                            injection=args.mix_layer, rngs={'noise': nkey})
    elif args.truncation < 1.0:
        w = G.apply({'params': params}, z, method=Generator.map_w)
        w_mean = jnp.mean(
            G.apply({'params': params},
                    jax.random.normal(jax.random.PRNGKey(args.seed + 99),
                                      (4096, args.style_dim)),
                    method=Generator.map_w), axis=0, keepdims=True)
        w = w_mean + args.truncation * (w - w_mean)
        images = G.apply({'params': params}, w, rngs={'noise': nkey},
                         method=Generator.synthesize_from_w)
    else:
        images, _ = G.apply({'params': params}, z, rngs={'noise': nkey})

    save_image(np.asarray(images), args.out, nrow=args.nrow)
    print(f'wrote {args.num} samples -> {args.out}')


if __name__ == '__main__':
    main()
