'''Ops-support utilities — TPU/JAX counterparts of the reference's
`thirdparty/stylegan2_ops/misc.py` (SURVEY §2.2 "misc (ops support)").

Reference surface and where each piece lands here:
  * `constant()` cached device constants (misc.py:19)        -> `constant`
  * `assert_shape` symbolic shape check (misc.py:77)         -> `assert_shape`
  * `profiled_function` record_function decorator (:95)      -> named_scope
  * `suppress_tracer_warnings` (:66)                         -> warnings filter
  * `params_and_buffers` / `copy_params_and_buffers` (:150)  -> pytree copies
  * `ddp_sync` no-sync context (:164)                        -> no-op (GSPMD
    keeps replicas consistent by construction; the consistency CHECK lives in
    `animeface_tpu.parallel.mesh.check_replica_consistency`, :175 analogue)
  * `print_module_summary` (:189)                            -> flax tabulate
  * `InfiniteSampler` (:106) -> the data loader's shard_count/shard_index
    iterator (`animeface_tpu/dataset/_base.py`), not re-exported here.
'''

from __future__ import annotations

import contextlib
import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _cached_constant(value, shape, dtype):
    arr = jnp.full(shape, value, dtype) if shape else jnp.asarray(value, dtype)
    return jax.device_put(arr)


def constant(value, shape=None, dtype=jnp.float32):
    '''Cached device constant (reference misc.py:19). Under jit constants
    are folded anyway; this helper matters for eager/setup code that builds
    the same filter/eye repeatedly.'''
    shape = tuple(int(s) for s in shape) if shape is not None else None
    return _cached_constant(float(value), shape, jnp.dtype(dtype).name)


def assert_shape(tensor, ref_shape):
    '''Symbolic shape assert (reference misc.py:77): None entries match any
    size. Works on traced values (shapes are static under jit).'''
    if tensor.ndim != len(ref_shape):
        raise AssertionError(
            f'Wrong number of dimensions: got {tensor.ndim}, '
            f'expected {len(ref_shape)}')
    for idx, (size, ref_size) in enumerate(zip(tensor.shape, ref_shape)):
        if ref_size is not None and size != ref_size:
            raise AssertionError(
                f'Wrong size for dimension {idx}: got {size}, '
                f'expected {ref_size}')


def profiled_function(fn):
    '''Marks `fn` in profiler traces (reference misc.py:95 record_function
    -> jax.named_scope; shows up in xprof/tensorboard timelines).'''
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)
    return wrapper


@contextlib.contextmanager
def suppress_tracer_warnings():
    '''Reference misc.py:66. JAX tracer-leak/conversion warnings silenced
    inside the block.'''
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        yield


def params_and_buffers(variables):
    '''Flatten a flax variables dict to (path, leaf) pairs — the analogue of
    iterating torch params+buffers (reference misc.py:150).'''
    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    return [('/'.join(str(getattr(k, 'key', k)) for k in path), leaf)
            for path, leaf in flat]


def copy_params_and_buffers(src_variables, dst_variables,
                            require_all: bool = False):
    '''Copy leaves from src into dst by tree path, returning a NEW dst tree
    (functional: flax state is immutable). Missing paths keep dst's values
    unless require_all (reference misc.py:150-161 semantics).'''
    src = dict(params_and_buffers(src_variables))

    def copy(path, leaf):
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        if name in src:
            other = src[name]
            assert tuple(other.shape) == tuple(leaf.shape), (name, other.shape,
                                                             leaf.shape)
            return jnp.asarray(other, leaf.dtype)
        if require_all:
            raise KeyError(f'missing parameter in source: {name}')
        return leaf

    return jax.tree_util.tree_map_with_path(copy, dst_variables)


def print_module_summary(module, *args, depth: int = 2, **kwargs):
    '''Parameter/shape table for a flax module (reference misc.py:189).'''
    import flax.linen as nn
    table = nn.tabulate(module, jax.random.PRNGKey(0), depth=depth,
                        console_kwargs={'width': 120})(*args, **kwargs)
    print(table)
    return table


@contextlib.contextmanager
def ddp_sync(module=None, sync: bool = True):
    '''Reference misc.py:164 kept the DDP allreduce from firing on
    accumulation steps. Under GSPMD the gradient psum is part of the
    compiled step and replicas cannot diverge, so this is a documented
    no-op kept for API parity.'''
    yield module
