'''API-compatible stand-ins for the reference's *_gradfix modules.

Reference `thirdparty/stylegan2_ops/ops/conv2d_gradfix.py` /
`grid_sample_gradfix.py` exist because torch's conv / grid_sample lacked
(fast) arbitrary-order gradients for R1 / path-length double-backward. Under
JAX every primitive is differentiable to arbitrary order by construction, so
these are thin functional wrappers that keep the reference's call sites
compiling unchanged.

NHWC layout (the reference was NCHW).
'''

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from animeface_tpu.ops.grid_sample import grid_sample  # noqa: F401 (re-export)

_weight_gradients_disabled = False


@contextlib.contextmanager
def no_weight_gradients(disable: bool = True):
    '''Reference conv2d_gradfix.no_weight_gradients (:20): stop weight grads
    (used under the R1 pass where only input grads are needed).'''
    global _weight_gradients_disabled
    old = _weight_gradients_disabled
    _weight_gradients_disabled = disable
    try:
        yield
    finally:
        _weight_gradients_disabled = old


def _maybe_stop_weight_grad(w):
    return jax.lax.stop_gradient(w) if _weight_gradients_disabled else w


def conv2d(x, w, stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1):
    '''Plain 2D conv, NHWC x / HWIO w (reference conv2d_gradfix.conv2d :29).'''
    w = _maybe_stop_weight_grad(w)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups)


def conv_transpose2d(x, w, stride: int = 1, padding: int = 0,
                     output_padding: int = 0, dilation: int = 1,
                     groups: int = 1):
    '''Transposed 2D conv via input dilation (reference :34). w is HWIO with
    I = input channels of the *forward* conv (torch IOHW semantics mapped).'''
    w = _maybe_stop_weight_grad(w)
    kh, kw = w.shape[0], w.shape[1]
    pad_lo = dilation * (kh - 1) - padding
    pad_hi = dilation * (kh - 1) - padding + output_padding
    pad_lo_w = dilation * (kw - 1) - padding
    pad_hi_w = dilation * (kw - 1) - padding + output_padding
    if groups != 1:
        raise NotImplementedError('grouped conv_transpose2d not needed by '
                                  'any shipped recipe')
    # w is [kh, kw, x_channels, out_channels]; transposed conv = spatial flip
    # + input dilation (no axis swap in this convention)
    w_t = jnp.flip(w, axis=(0, 1))
    return jax.lax.conv_general_dilated(
        x, w_t.astype(x.dtype), (1, 1),
        ((pad_lo, pad_hi), (pad_lo_w, pad_hi_w)),
        lhs_dilation=(stride, stride),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
