'''Gradient penalties via native `jax.grad` double-backward.

Reference: `nnutils/loss/penalty.py` — `gradient_penalty` (:33, WGAN-gp),
`dragan_penalty` (:60), `r1_regularizer` (:85), `r2_regularizer` (:103).
The reference needed `torch.autograd.grad` + GradScaler plumbing; in JAX the
inner gradient is just `jax.grad` of the per-sample D-sum, and the outer
train-step `jax.grad` differentiates through it for free (the property
conv2d_gradfix existed to provide). No scaler arguments: bf16-on-TPU needs no
loss scaling, and penalties run in float32 by construction.

All penalties take `d_apply`: a callable `x -> logits` (close params over it at
the call site so the penalty differentiates w.r.t. the *input*, while the outer
grad differentiates w.r.t. params).
'''

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _input_gradients(d_apply: Callable, x):
    '''d/dx sum(D(x)) — per-sample input gradients (rows independent).'''
    def summed(inp):
        out = d_apply(inp)
        return jnp.sum(out.astype(jnp.float32))
    return jax.grad(summed)(x.astype(jnp.float32))


def _norm_penalty(gradients, center: float):
    g = gradients.reshape(gradients.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(g * g, axis=1) + 1e-12)
    return jnp.mean((norm - center) ** 2)


def gradient_penalty(key, real, fake, d_apply: Callable, center: float = 1.0):
    '''WGAN-gp: penalty on D's input-gradient norm at a real/fake interpolate.

    Matches reference semantics: single scalar alpha per batch
    (`penalty.py:44` uses torch.rand(1)).
    '''
    assert center in (1.0, 0.0)
    alpha = jax.random.uniform(key, (1, 1, 1, 1), dtype=jnp.float32)
    x_hat = real.astype(jnp.float32) * alpha + fake.astype(jnp.float32) * (1.0 - alpha)
    gradients = _input_gradients(d_apply, x_hat)
    return _norm_penalty(gradients, center)


def dragan_penalty(key, real, d_apply: Callable, center: float = 1.0):
    '''DRAGAN: penalty at real + 0.5*std*noise perturbations.'''
    k1, k2 = jax.random.split(key)
    real = real.astype(jnp.float32)
    alpha = jax.random.uniform(k1, (real.shape[0], 1, 1, 1), dtype=jnp.float32)
    beta = jax.random.uniform(k2, real.shape, dtype=jnp.float32)
    x_hat = real * alpha + (1.0 - alpha) * (real + 0.5 * jnp.std(real) * beta)
    gradients = _input_gradients(d_apply, x_hat)
    return _norm_penalty(gradients, center)


def r1_regularizer(real, d_apply: Callable):
    '''R1: E[ ||∇_x D(x)||² ] / 2 on real images.'''
    gradients = _input_gradients(d_apply, real)
    g = gradients.reshape(gradients.shape[0], -1)
    return jnp.mean(jnp.sum(g * g, axis=1)) / 2.0


def r2_regularizer(fake, d_apply: Callable):
    '''R2: same as R1 but on fakes.'''
    return r1_regularizer(fake, d_apply)
