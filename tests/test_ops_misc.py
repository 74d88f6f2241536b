'''ops/misc.py — the reference thirdparty misc.py support utilities
(SURVEY §2.2): symbolic assert_shape, cached constants, named-scope
profiling decorator, pytree param copies, flax module summary.'''

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from animeface_tpu.ops.misc import (
    constant, assert_shape, profiled_function, suppress_tracer_warnings,
    params_and_buffers, copy_params_and_buffers, print_module_summary,
    ddp_sync)


def test_constant_is_cached():
    a = constant(1.5, (2, 3))
    b = constant(1.5, (2, 3))
    assert a is b
    np.testing.assert_array_equal(np.asarray(a), np.full((2, 3), 1.5))
    assert constant(2.0).shape == ()


def test_assert_shape_symbolic():
    x = jnp.zeros((4, 8, 8, 3))
    assert_shape(x, [None, 8, 8, 3])
    with pytest.raises(AssertionError, match='dimension 3'):
        assert_shape(x, [None, 8, 8, 4])
    with pytest.raises(AssertionError, match='number of dimensions'):
        assert_shape(x, [None, 8, 8])
    # works under jit (static shapes on tracers)
    jax.jit(lambda v: (assert_shape(v, [4, None, 8, 3]), v * 2)[1])(x)


def test_profiled_function_passthrough():
    @profiled_function
    def f(x):
        return x + 1
    assert float(f(jnp.float32(1.0))) == 2.0
    assert f.__name__ == 'f'


class _M(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(4)(nn.Dense(8)(x))


def test_copy_params_and_buffers():
    m = _M()
    v1 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    v2 = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)))
    named = dict(params_and_buffers(v1))
    assert any('Dense_0' in k and 'kernel' in k for k in named)

    copied = copy_params_and_buffers(v1, v2)
    for (_, a), (_, b) in zip(params_and_buffers(v1),
                              params_and_buffers(copied)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(KeyError):
        copy_params_and_buffers({'params': {}}, v2, require_all=True)


def test_print_module_summary_and_ddp_sync(capsys):
    table = print_module_summary(_M(), jnp.zeros((1, 3)))
    assert 'Dense' in table
    with ddp_sync(sync=False):
        pass
    with suppress_tracer_warnings():
        pass
