'''Explicit PRNG management replacing the reference's implicit CUDA RNG.

Reference: `nnutils/training.py:7,15` (`sample_nnoise`, `sample_unoise`).
In JAX randomness is functional: every sampler takes a key. `KeyGen` is the
host-side convenience that threads a root key through a training script.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp


class KeyGen:
    '''Splits a root PRNG key on demand.

    >>> keys = KeyGen(0)
    >>> z = sample_nnoise(keys(), (8, 128))
    '''

    def __init__(self, seed: int = 0) -> None:
        self._key = jax.random.PRNGKey(seed)

    def __call__(self, n: int | None = None):
        if n is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs

    @property
    def key(self):
        return self._key

    def state_dict(self) -> dict:
        import numpy as np
        return {'key': np.asarray(jax.random.key_data(self._key))}

    def load_state_dict(self, state: dict) -> None:
        self._key = jax.random.wrap_key_data(jnp.asarray(state['key']))


def sample_nnoise(key, size, mean: float = 0., std: float = 1., dtype=jnp.float32):
    '''Normal noise (reference sample_nnoise).'''
    return jax.random.normal(key, size, dtype) * std + mean


def sample_unoise(key, size, start: float = 0., end: float = 1., dtype=jnp.float32):
    '''Uniform noise (reference sample_unoise).'''
    return jax.random.uniform(key, size, dtype, minval=start, maxval=end)
