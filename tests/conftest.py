'''Test configuration: force an 8-device virtual CPU mesh before jax import.

This is the fake-backend substitute for multi-chip TPU (SURVEY.md §4): sharding
and collective behavior is validated on 8 host devices; numerical kernels run
in XLA:CPU (Pallas kernels use interpret mode on CPU).
'''

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms at interpreter start; reclaim CPU before backends initialize.
jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu', jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def devices():
    return jax.devices()


@pytest.fixture()
def key():
    return jax.random.PRNGKey(0)
