'''Anchored phase packing (nnutils/phase_pack.py): exactness oracles.

The packing study is a measured PERF attempt (PERF_NOTES.md "Narrow-conv
layout attempts"): packed convs are exact re-expressions of narrow convs at
4x channel width. They did NOT pay end-to-end on this toolchain (the 16/9-
or 4x-FLOP structure tax meets only ~35% achieved MXU utilization), so
production models do not use them — these tests pin the transforms as the
documented, reproducible evidence for the roofline argument.
'''

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as fnn

from animeface_tpu.nnutils.phase_pack import (
    pack2, unpack2, phase_mean, packed_conv3x3, packed_conv1x1)


def _conv_same(x, W):
    pad = (W.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, W, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def test_pack_roundtrip_and_pool():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 5))
    np.testing.assert_allclose(np.asarray(unpack2(pack2(x))), np.asarray(x))
    ap = fnn.avg_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_allclose(np.asarray(phase_mean(pack2(x))),
                               np.asarray(ap), atol=1e-6)


def test_packed_conv_matches_unpacked():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 16, 5))
    W3 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 5, 7))
    W1 = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 5, 7))
    np.testing.assert_allclose(
        np.asarray(packed_conv3x3(pack2(x), W3)),
        np.asarray(pack2(_conv_same(x, W3))), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(packed_conv1x1(pack2(x), W1)),
        np.asarray(pack2(_conv_same(x, W1))), atol=1e-5)


def test_packed_conv_weight_gradients_match():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 8, 8, 3))
    W3 = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 3, 4))
    g_packed = jax.grad(
        lambda w: jnp.sum(jnp.square(packed_conv3x3(pack2(x), w))))(W3)
    g_ref = jax.grad(
        lambda w: jnp.sum(jnp.square(_conv_same(x, w))))(W3)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-4)
