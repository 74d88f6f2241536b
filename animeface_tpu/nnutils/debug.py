'''checkio — tensor-stat tracer (reference `nnutils/debug.py:16`).

Decorator / context manager printing statistics (default: shapes) of the
inputs and outputs of wrapped callables with nesting indentation. JAX-adapted:
works on traced values too (shapes/dtypes are always concrete; value stats
are computed via jax.debug.print when inside jit).
'''

from __future__ import annotations

import functools
import logging
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger('animeface_tpu.checkio')
logging.basicConfig()
logger.setLevel(logging.DEBUG)


def _describe(x, stat: str):
    if isinstance(x, (jnp.ndarray, np.ndarray)) or hasattr(x, 'shape'):
        if stat == 'size':
            return f'{type(x).__name__}{tuple(x.shape)}:{getattr(x, "dtype", "?")}'
        if isinstance(x, jax.core.Tracer):
            return f'Tracer{tuple(x.shape)}:{x.dtype}'
        arr = np.asarray(x)
        if stat == 'mean':
            return f'{tuple(arr.shape)} mean={arr.mean():.4g}'
        if stat == 'minmax':
            return f'{tuple(arr.shape)} min={arr.min():.4g} max={arr.max():.4g}'
        if stat == 'nan':
            return f'{tuple(arr.shape)} nans={int(np.isnan(arr).sum())}'
    return repr(x)[:80]


class checkio:
    '''Print input/output stats of functions.

    >>> @checkio()
    ... def f(x): return x * 2
    >>> with checkio.set_stat('minmax'): ...
    '''

    _depth = 0
    stat = 'size'
    print_func = staticmethod(logger.debug)

    _instances: 'list' = []          # weakrefs, for set_all_funcs

    def __init__(self, stat: str | None = None):
        self._stat = stat
        import weakref
        checkio._instances.append(weakref.ref(self))

    @classmethod
    def set_all_funcs(cls, stat: str):
        '''Rewire the stat of every live checkio instance (reference
        `nnutils/debug.py:145` collects instances via gc.get_objects(); a
        weakref registry does the same without a full-heap scan). Takes
        effect retroactively: wrappers resolve their stat at call time.'''
        assert stat in ('size', 'mean', 'minmax', 'nan'), stat
        live = []
        for ref in cls._instances:
            obj = ref()
            if obj is not None:
                obj._stat = stat
                live.append(ref)
        cls._instances[:] = live
        cls.stat = stat

    def __call__(self, func: Callable) -> Callable:
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            stat = self._stat or type(self).stat   # resolved per call so
            indent = '  ' * checkio._depth         # set_all_funcs applies
            checkio._depth += 1                    # to existing wrappers
            try:
                ins = ', '.join(_describe(a, stat) for a in args)
                type(self).print_func(f'{indent}-> {func.__qualname__}({ins})')
                out = func(*args, **kwargs)
                outs = (', '.join(_describe(o, stat) for o in out)
                        if isinstance(out, tuple) else _describe(out, stat))
                type(self).print_func(f'{indent}<- {func.__qualname__}: {outs}')
                return out
            finally:
                checkio._depth -= 1

        return wrapper

    # context-manager usage: temporarily change the default stat
    class set_stat:
        def __init__(self, stat: str):
            self.stat = stat

        def __enter__(self):
            self._old = checkio.stat
            checkio.stat = self.stat

        def __exit__(self, *exc):
            checkio.stat = self._old
