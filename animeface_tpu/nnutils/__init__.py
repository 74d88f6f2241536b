'''Core NN runtime (reference `nnutils/` parity, TPU-native).

`get_device` -> returns the jax default device (reference returned cuda:0/cpu);
multi-device placement is handled by `animeface_tpu.parallel`, not here.
`freeze`/`unfreeze` in functional JAX act on *gradient flow*: `freeze(params)`
wraps leaves in stop_gradient for use inside a loss; optimizer-level freezing
is done by simply not passing those params to the optimizer.
`profile_once` traces one call with the jax profiler.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp

from animeface_tpu.nnutils.rng import KeyGen, sample_nnoise, sample_unoise
from animeface_tpu.nnutils.training import (
    update_ema, ema_decay_from_nimg, count_params,
)
from animeface_tpu.nnutils.initialize import init, get_initializer, apply_init


def apply_mutable(mod, params, extra, *args, **kwargs):
    '''Train-mode `mod.apply` with whatever extra collections the module
    carries (`extra`: e.g. batch_stats holding BN moments and flax
    SpectralNorm power-iteration state). Returns (out, mutated_collections);
    `mutated_collections` is {} when the module is stateless, so
    `{'params': p, **mut}` round-trips either way.'''
    if extra:
        return mod.apply({'params': params, **extra}, *args,
                         mutable=list(extra), **kwargs)
    return mod.apply({'params': params}, *args, **kwargs), {}


def split_vars(variables):
    '''variables -> (params, extra-collections dict).'''
    extra = {k: v for k, v in variables.items() if k != 'params'}
    return variables['params'], extra


def get_device(disable_gpu: bool = False):
    '''Default accelerator device (reference nnutils/__init__.py:18).'''
    if disable_gpu:
        return jax.devices('cpu')[0]
    return jax.devices()[0]


def freeze(tree):
    '''Block gradient flow through a params pytree (use inside loss fns).'''
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


def unfreeze(tree):
    '''No-op for API parity: params are never mutated in-place in JAX.'''
    return tree


def profile_once(fn, args=(), trace_dir: str = '/tmp/animeface_tpu_trace'):
    '''Run `fn(*args)` once under the jax profiler and return its result.

    Reference `profile_once` (nnutils/__init__.py:33) printed a torch.profiler
    table; the JAX equivalent writes a TensorBoard-loadable trace.
    '''
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f'[profile_once] trace written to {trace_dir}')
    return out
