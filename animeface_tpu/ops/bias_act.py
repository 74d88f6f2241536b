'''bias_act — fused bias-add → activation → gain → clamp.

TPU-native rebuild of reference `thirdparty/stylegan3_ops/ops/bias_act.py`
(activation table :17-27, wrapper :49, ref impl :88, CUDA grad kernels :123-200).
On TPU this is a pure elementwise chain that XLA fuses into the surrounding
convolution/matmul epilogue, so the 'xla' implementation is already the fast
path; a Pallas variant exists for standalone invocations on large tensors.
First/second-order gradients come from `jax.grad` — no hand-written grad
kernel (`BiasActCudaGrad`) is needed.

Layout-free: works on any-rank tensors; `dim` selects the bias axis
(default -1, the NHWC channel axis; the reference defaulted to 1 for NCHW).
'''

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from animeface_tpu.ops.registry import resolve_impl
from animeface_tpu.utils.misc import EasyDict

activation_funcs = {
    'linear':   EasyDict(func=lambda x, **_: x,
                         def_alpha=0.0, def_gain=1.0),
    'relu':     EasyDict(func=lambda x, **_: jax.nn.relu(x),
                         def_alpha=0.0, def_gain=float(np.sqrt(2))),
    'lrelu':    EasyDict(func=lambda x, alpha, **_: jax.nn.leaky_relu(x, alpha),
                         def_alpha=0.2, def_gain=float(np.sqrt(2))),
    'tanh':     EasyDict(func=lambda x, **_: jnp.tanh(x),
                         def_alpha=0.0, def_gain=1.0),
    'sigmoid':  EasyDict(func=lambda x, **_: jax.nn.sigmoid(x),
                         def_alpha=0.0, def_gain=1.0),
    'elu':      EasyDict(func=lambda x, **_: jax.nn.elu(x),
                         def_alpha=0.0, def_gain=1.0),
    'selu':     EasyDict(func=lambda x, **_: jax.nn.selu(x),
                         def_alpha=0.0, def_gain=1.0),
    'softplus': EasyDict(func=lambda x, **_: jax.nn.softplus(x),
                         def_alpha=0.0, def_gain=1.0),
    'swish':    EasyDict(func=lambda x, **_: jax.nn.silu(x),
                         def_alpha=0.0, def_gain=float(np.sqrt(2))),
}


@jax.named_scope('ops.bias_act')    # reference profiled_function seam (bias_act.py:87)
def bias_act(x, b=None, dim: int = -1, act: str = 'linear', alpha=None,
             gain=None, clamp=None, impl: str | None = None):
    '''Fused bias + activation + gain + clamp (reference bias_act :49).'''
    assert clamp is None or clamp >= 0
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1)

    impl = resolve_impl(impl)
    if impl == 'pallas':
        from animeface_tpu.ops import pallas_kernels
        fn = pallas_kernels.bias_act_pallas
        if fn is not None:
            out = fn(x, b, dim, act, alpha, gain, clamp)
            if out is not None:
                return out

    if b is not None:
        assert b.ndim == 1
        axis = dim % x.ndim
        assert b.shape[0] == x.shape[axis]
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.func(x, alpha=alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
