'''Export the flagship Generator as a serialized StableHLO artifact.

The reference's only inference contract is "build the module, load the
state_dict, call it" (`/root/reference/weights.md:1-40`). For production
serving the TPU-native equivalent is `jax.export`: the jitted sampling
function — params baked in as constants — lowered to StableHLO and
serialized to one self-contained file. The artifact needs only `jax` to
load (no flax, no animeface_tpu), runs on CPU or TPU, and has a symbolic
batch dimension so one export serves any batch size.

    python tools/export_stablehlo.py --weights G.msgpack --out g.stablehlo \
        [--image-size 256] [--truncation 0.7] [--random-weights]

    # serving side:
    from jax import export
    g = export.deserialize(open('g.stablehlo', 'rb').read())
    images = g.call(z, noise_seed)     # z: [B, style_dim] f32, seed: [] u32

Verification (--verify, default on): deserializes the artifact and checks
its output against a direct `G.apply` on the same inputs.
'''

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', default='StyleGAN2', choices=['StyleGAN2'])
    p.add_argument('--weights', default=None,
                   help='flax msgpack Generator weights (tools/WEIGHTS.md)')
    p.add_argument('--random-weights', action='store_true',
                   help='export with fresh-init weights (pipeline test)')
    p.add_argument('--out', default='generator.stablehlo')
    p.add_argument('--image-size', type=int, default=256)
    p.add_argument('--style-dim', type=int, default=512)
    p.add_argument('--channels', type=int, default=32)
    p.add_argument('--max-channels', type=int, default=512)
    p.add_argument('--truncation', type=float, default=1.0,
                   help='w-space truncation baked into the artifact')
    p.add_argument('--platforms', nargs='*', default=['cpu', 'tpu'],
                   help='lowering platforms embedded in the artifact')
    p.add_argument('--no-verify', action='store_true')
    args = p.parse_args()

    import jax
    # the axon sitecustomize force-registers the TPU and ignores
    # JAX_PLATFORMS; this hook makes CPU exports possible (main.py:16-21)
    platform = os.environ.get('ANIMEFACE_PLATFORM')
    if platform:
        jax.config.update('jax_platforms', platform)
    if jax.default_backend() not in args.platforms:
        # lowering for platforms is independent of the local backend, but
        # the verify pass must run on one of them
        args.platforms.append(jax.default_backend())
    import jax.numpy as jnp
    import numpy as np
    from jax import export
    from animeface_tpu.implementations.StyleGAN2.model import Generator

    G = Generator(image_size=args.image_size, style_dim=args.style_dim,
                  channels=args.channels, max_channels=args.max_channels)
    template = G.init({'params': jax.random.PRNGKey(0),
                       'noise': jax.random.PRNGKey(1)},
                      jnp.zeros((1, args.style_dim)))['params']
    if args.random_weights or args.weights is None:
        if not args.random_weights:
            print('no --weights given: exporting random-init weights '
                  '(--random-weights to silence)', file=sys.stderr)
        params = template
    else:
        from animeface_tpu.checkpoint import load_model
        params = load_model(args.weights, template)

    if args.truncation < 1.0:
        w_mean = jnp.mean(
            G.apply({'params': params},
                    jax.random.normal(jax.random.PRNGKey(99),
                                      (4096, args.style_dim)),
                    method=Generator.map_w), axis=0, keepdims=True)

    def sample(z, noise_seed):
        '''z: [B, style_dim] f32, noise_seed: [] uint32 -> [B, H, W, 3] f32.'''
        rng = jax.random.key(noise_seed)
        if args.truncation < 1.0:
            w = G.apply({'params': params}, z, method=Generator.map_w)
            w = w_mean + args.truncation * (w - w_mean)
            images = G.apply({'params': params}, w, rngs={'noise': rng},
                             method=Generator.synthesize_from_w)
        else:
            images, _ = G.apply({'params': params}, z, rngs={'noise': rng})
        return images.astype(jnp.float32)

    (b,) = export.symbolic_shape('b')
    exported = export.export(jax.jit(sample), platforms=args.platforms)(
        jax.ShapeDtypeStruct((b, args.style_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.uint32))
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'wrote {args.out} ({len(blob) / 1e6:.1f} MB, '
          f'platforms={args.platforms}, batch=symbolic)')

    if not args.no_verify:
        g = export.deserialize(blob)
        z = jax.random.normal(jax.random.PRNGKey(3), (2, args.style_dim))
        seed = jnp.uint32(7)
        got = np.asarray(g.call(z, seed))
        want = np.asarray(sample(z, seed))
        err = float(np.max(np.abs(got - want)))
        assert got.shape == want.shape and err < 1e-3, (got.shape, err)
        print(f'verify: deserialize+call matches direct apply '
              f'(max err {err:.2e})')


if __name__ == '__main__':
    main()
