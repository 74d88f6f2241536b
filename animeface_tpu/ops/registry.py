'''Kernel-implementation registry.

TPU-native replacement for the reference's JIT plugin loader
(`thirdparty/stylegan3_ops/custom_ops.py:53` `get_plugin`): instead of compiling
CUDA at runtime, ops select between implementations by name —
  * 'xla'    — pure jax.numpy / lax formulation (always available, the oracle)
  * 'pallas' — hand-written Pallas TPU kernel for the hot path

Default comes from $ANIMEFACE_OPS_IMPL or 'xla'. Each op degrades to 'xla'
when no Pallas kernel is registered for its configuration (mirroring the
reference's plugin-build fallback at `upfirdn2d.py:156-158`).
'''

from __future__ import annotations

import os

_VALID = ('xla', 'pallas')
_default_impl = os.environ.get('ANIMEFACE_OPS_IMPL', 'xla')


def set_default_impl(impl: str) -> None:
    global _default_impl
    assert impl in _VALID, impl
    _default_impl = impl


def get_default_impl() -> str:
    return _default_impl


def resolve_impl(impl: str | None) -> str:
    if impl is None or impl == 'auto':
        return _default_impl
    assert impl in _VALID, impl
    return impl
