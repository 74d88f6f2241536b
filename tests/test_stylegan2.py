'''StyleGAN2 model-level tests: modulated-conv factorization equivalence,
shapes, style mixing, minibatch-stddev semantics, path-length penalty.'''

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animeface_tpu.implementations.StyleGAN2.model import (
    Generator, Discriminator, ModulatedConv, MiniBatchStdDev, Mapping,
    _g_channel_ladder,
)


def test_modulated_conv_equals_grouped_reference(key):
    '''conv(x*s, W)*d must equal the reference's per-sample weight-modulated
    grouped conv (model.py:106-133 semantics).'''
    k1, k2, k3 = jax.random.split(key, 3)
    B, H, W_, CI, CO, K = 2, 5, 5, 4, 6, 3
    mc = ModulatedConv(features=CO, kernel_size=K, demod=True)
    x = jax.random.normal(k1, (B, H, W_, CI))
    w_style = jax.random.normal(k2, (B, 8))
    variables = mc.init(k3, x, w_style)
    got = mc.apply(variables, x, w_style)

    # reference formulation in numpy, NHWC
    kern = np.asarray(variables['params']['kernel'])          # [K,K,CI,CO]
    aff_k = np.asarray(variables['params']['affine']['kernel'])
    aff_b = np.asarray(variables['params']['affine']['bias'])
    bias = np.asarray(variables['params']['bias'])
    coef_aff = 1.0 / np.sqrt(aff_k.shape[0])
    s = np.asarray(w_style) @ (aff_k * coef_aff) + aff_b + 1.0  # [B,CI]
    coef = 1.0 / np.sqrt(CI * K * K)

    out = np.zeros((B, H, W_, CO), np.float32)
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    for b in range(B):
        wb = kern * coef * s[b][None, None, :, None]          # modulate
        d = 1.0 / np.sqrt((wb ** 2).sum(axis=(0, 1, 2)) + 1e-4)
        wb = wb * d[None, None, None, :]                      # demodulate
        for i in range(H):
            for j in range(W_):
                patch = xp[b, i:i + K, j:j + K]               # [K,K,CI]
                out[b, i, j] = np.einsum('kli,klio->o', patch, wb)
    out = out + bias

    np.testing.assert_allclose(np.asarray(got), out, rtol=2e-3, atol=2e-3)


def test_generator_shapes_and_mixing(key):
    G = Generator(image_size=32, style_dim=16, channels=8, max_channels=32,
                  map_num_layers=2)
    z = jax.random.normal(key, (2, 16))
    variables = G.init({'params': key, 'noise': key, 'mixing': key}, z)
    img, w = G.apply(variables, z, rngs={'noise': key})
    assert img.shape == (2, 32, 32, 3)
    assert w.shape == (2, 16)
    assert float(jnp.abs(img).max()) <= 1.0  # tanh output

    # style mixing with explicit injection index
    z2 = jax.random.normal(jax.random.split(key)[0], (2, 16))
    img_mix, _ = G.apply(variables, (z, z2), injection=2,
                         rngs={'noise': key, 'mixing': key})
    assert img_mix.shape == (2, 32, 32, 3)
    # mixing with z2 != z must change the output
    assert not np.allclose(np.asarray(img), np.asarray(img_mix), atol=1e-3)


def test_discriminator_shapes(key):
    D = Discriminator(image_size=32, channels=8, max_channels=32)
    x = jax.random.normal(key, (4, 32, 32, 3))
    variables = D.init(key, x)
    out = D.apply(variables, x)
    assert out.shape == (4, 1)


def test_channel_ladder_reference_config():
    # 128px, channels=32, max 512 (reference Synthesis :285)
    assert _g_channel_ladder(128, 32, 512) == [512, 512, 256, 128, 64, 32]


def test_minibatch_stddev_group_fallback(key):
    m = MiniBatchStdDev(group_size=4)
    x = jax.random.normal(key, (6, 4, 4, 8))  # 6 % 4 != 0 -> one group of 6
    y = m.apply({}, x)
    assert y.shape == (6, 4, 4, 9)
    # all samples share the whole-batch stat
    stat = np.asarray(y[..., -1])
    assert np.allclose(stat, stat[0])


def test_mapping_pixelnorm(key):
    m = Mapping(style_dim=8, num_layers=1, normalize=True)
    z = jax.random.normal(key, (4, 8)) * 100.0  # large-scale input
    variables = m.init(key, z)
    w = m.apply(variables, z)
    assert bool(jnp.all(jnp.isfinite(w)))
    # normalization makes output invariant to input scale
    w2 = m.apply(variables, z / 100.0)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), rtol=1e-3, atol=1e-4)


def test_path_length_penalty_differentiable(key):
    from animeface_tpu.implementations.StyleGAN2.utils import pl_lengths
    G = Generator(image_size=16, style_dim=8, channels=4, max_channels=16,
                  map_num_layers=1)
    z = jax.random.normal(key, (2, 8))
    variables = G.init({'params': key, 'noise': key, 'mixing': key}, z)

    def loss(params):
        w = G.apply({'params': params}, z, method=Generator.map_w)
        lengths = pl_lengths(G, params, w, {'noise': key})
        return jnp.mean((lengths - 0.5) ** 2)

    g = jax.grad(loss)(variables['params'])
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
    total = sum(float(jnp.abs(x).sum()) for x in flat)
    assert total > 0


def test_fused_resample_matches_composition(key):
    '''upblur2x_fused / upsample2x_fused are interior-exact vs the reference
    upsample->blur composition (borders differ <=2px, edge-clamp vs zero-pad).'''
    from animeface_tpu.implementations.StyleGAN2.model import (
        upblur2x_fused, upsample2x_fused, upsample2x_bilinear, Blur2d,
    )
    x = jax.random.normal(key, (2, 8, 8, 4))
    ref = Blur2d().apply({}, upsample2x_bilinear(x))
    got = upblur2x_fused(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got[:, 3:-3, 3:-3]),
                               np.asarray(ref[:, 3:-3, 3:-3]), atol=1e-5)
    ref2 = upsample2x_bilinear(x)
    got2 = upsample2x_fused(x)
    np.testing.assert_allclose(np.asarray(got2[:, 2:-2, 2:-2]),
                               np.asarray(ref2[:, 2:-2, 2:-2]), atol=1e-5)
