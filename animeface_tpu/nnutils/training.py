'''Training primitives: EMA update and noise samplers.

Reference: `nnutils/training.py` — `update_ema` (:24) was in-place over named
parameters; here it is a pure pytree map, safe inside a jitted train step.
'''

from __future__ import annotations

import jax
import jax.numpy as jnp

from animeface_tpu.nnutils.rng import sample_nnoise, sample_unoise  # noqa: F401 (re-export)


def update_ema(params, ema_params, decay: float = 0.999):
    '''ema = decay * ema + (1 - decay) * params, as a pure pytree op.

    `decay=0` bootstraps the EMA copy (reference uses this at init).
    Returns the new EMA pytree.
    '''
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def ema_decay_from_nimg(batch_size: int, ema_nimg: float = 10_000.0) -> float:
    '''StyleGAN-style half-life parameterisation: decay s.t. half-life = ema_nimg images.'''
    return 0.5 ** (batch_size / max(ema_nimg, 1e-8))


def count_params(params) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(params))
