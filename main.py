'''CLI dispatcher: `python main.py <Model> [flags]` (reference main.py:11-18).

Dynamically imports `animeface_tpu.implementations.<Model>` and calls its
`main(parser)`.
'''

import sys
from importlib import import_module

from animeface_tpu.utils import argument, debug_mode


def main():
    # the axon sitecustomize force-registers the TPU and ignores
    # JAX_PLATFORMS; this hook makes CPU CLI runs possible
    # (ANIMEFACE_PLATFORM=cpu python main.py ...)
    import os
    platform = os.environ.get('ANIMEFACE_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    parser = argument.get_default_parser()
    args = parser.parse_known_args()[0]
    if args.debug:
        debug_mode()
    # multi-host: must run before the first jax backend touch so the mesh
    # the recipe builds spans the whole slice (no-op unless requested)
    from animeface_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed(args)
    try:
        module = import_module(f'animeface_tpu.implementations.{args.name}')
    except ModuleNotFoundError as e:
        if args.name in str(e):
            import os
            impl_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    'animeface_tpu', 'implementations')
            have = sorted(d for d in os.listdir(impl_dir)
                          if os.path.isdir(os.path.join(impl_dir, d))
                          and not d.startswith('_'))
            print(f'error: unknown implementation {args.name!r}.\n'
                  f'available: {", ".join(have)}', file=sys.stderr)
            sys.exit(2)
        raise
    module.main(parser)


if __name__ == '__main__':
    main()
