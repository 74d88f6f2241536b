'''Ops-layer tests: upfirdn2d / bias_act / filtered_lrelu / conv2d_resample /
grid_sample against independent numpy oracles (spec: SURVEY.md §2.2), plus
gradient checks covering the arbitrary-order-differentiability property.
'''

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.signal

from animeface_tpu.ops import (
    setup_filter, upfirdn2d, filter2d, upsample2d, downsample2d,
    bias_act, filtered_lrelu, conv2d_resample, grid_sample, fma,
)


def np_upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    '''Brute-force numpy oracle implementing the documented upfirdn2d spec
    (zero-insert -> pad/crop -> 2D convolve -> downsample), NHWC.'''
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    upx, upy = up
    downx, downy = down
    if isinstance(padding, int):
        padding = [padding] * 4
    if len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    px0, px1, py0, py1 = padding
    if f is None:
        f = np.ones((1, 1), np.float32)
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        f = np.outer(f, f)  # total gain handling below matches (gain**0.5)**2
        gain_nd = gain
    else:
        gain_nd = gain
    N, H, W, C = x.shape
    # zero-insert upsample
    up_img = np.zeros((N, H * upy, W * upx, C), np.float64)
    up_img[:, ::upy, ::upx] = x
    # pad / crop
    up_img = np.pad(up_img, ((0, 0), (max(py0, 0), max(py1, 0)),
                             (max(px0, 0), max(px1, 0)), (0, 0)))
    up_img = up_img[:, max(-py0, 0): up_img.shape[1] - max(-py1, 0),
                    max(-px0, 0): up_img.shape[2] - max(-px1, 0)]
    # convolve (flip_filter False = convolution)
    ff = f * gain_nd
    if not flip_filter:
        ff = ff[::-1, ::-1]
    out = np.zeros((N, up_img.shape[1] - f.shape[0] + 1,
                    up_img.shape[2] - f.shape[1] + 1, C), np.float64)
    for n in range(N):
        for c in range(C):
            out[n, :, :, c] = scipy.signal.correlate2d(up_img[n, :, :, c], ff, mode='valid')
    return out[:, ::downy, ::downx].astype(np.float32)


@pytest.fixture()
def rand_img(key):
    return jax.random.normal(key, (2, 8, 8, 3), jnp.float32)


CONFIGS = [
    dict(up=1, down=1, padding=0),
    dict(up=2, down=1, padding=2),
    dict(up=1, down=2, padding=1),
    dict(up=2, down=2, padding=[1, 2, 3, 0]),
    dict(up=1, down=1, padding=[-1, -1, -1, -1]),   # negative = crop
    dict(up=[2, 1], down=[1, 2], padding=[2, 1]),
    dict(up=4, down=1, padding=3, flip_filter=True),
    dict(up=1, down=1, padding=2, gain=2.0),
]


@pytest.mark.parametrize('cfg', CONFIGS)
@pytest.mark.parametrize('ftype', ['none', '2d', 'sep'])
def test_upfirdn2d_matches_numpy_oracle(rand_img, cfg, ftype):
    if ftype == 'none':
        f = None
    elif ftype == '2d':
        f = setup_filter([[1., 2., 1.], [2., 4., 2.], [1., 2., 1.]])
    else:
        f = setup_filter([1., 3., 3., 1.] * 2)  # 8 taps -> stays separable
        assert f.ndim == 1
        if cfg.get('padding') == [-1, -1, -1, -1]:
            # invalid: cropped buffer smaller than the 8-tap filter
            # (reference asserts the same at upfirdn2d.py:178)
            pytest.skip('filter larger than cropped buffer')
    got = upfirdn2d(rand_img, f, **cfg)
    want = np_upfirdn2d(np.asarray(rand_img), None if f is None else np.asarray(f), **cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_upfirdn2d_separable_matches_scipy(key):
    '''Cross-check a single-axis FIR pass against scipy.signal.upfirdn.'''
    x = jax.random.normal(key, (1, 1, 16, 1), jnp.float32)  # a row signal
    taps = np.array([1., 2., 3., 4., 3., 2., 1., 0.5], np.float32)
    f = jnp.asarray(taps)[None, :]  # 2-D [1,8] row filter: one x-axis pass
    up, down = 2, 1
    pad = len(taps) - 1
    got = upfirdn2d(x, f, up=[up, 1], down=[down, 1], padding=[pad, pad, 0, 0],
                    gain=1, flip_filter=False)
    sig = np.asarray(x)[0, 0, :, 0]
    want_full = scipy.signal.upfirdn(taps, sig, up=up, down=down)
    # upfirdn2d zero-inserts AFTER the last sample too -> one extra tail value
    got_row = np.asarray(got)[0, 0, :, 0]
    assert got_row.shape[0] == want_full.shape[0] + 1
    np.testing.assert_allclose(got_row[:want_full.shape[0]], want_full,
                               rtol=1e-4, atol=1e-4)


def test_setup_filter_properties():
    f = setup_filter([1., 3., 3., 1.])
    assert f.ndim == 2 and f.shape == (4, 4)  # short 1-D -> outer product
    assert np.isclose(float(jnp.sum(f)), 1.0)
    fs = setup_filter([1.] * 8)
    assert fs.ndim == 1                        # >= 8 taps stays separable
    assert np.isclose(float(jnp.sum(fs)), 1.0)
    fg = setup_filter([1., 1.], gain=4.0)
    assert np.isclose(float(jnp.sum(fg)), 4.0)  # 2-D: gain**(2/2)=4 applied
    fi = setup_filter(None)
    assert fi.shape == (1, 1) and float(fi[0, 0]) == 1.0


def test_filter2d_keeps_shape(rand_img):
    f = setup_filter([1., 2., 1.])
    y = filter2d(rand_img, f)
    assert y.shape == rand_img.shape
    # DC preservation: constant input stays constant (away from borders)
    const = jnp.ones_like(rand_img)
    y = filter2d(const, f)
    assert np.isclose(float(y[0, 4, 4, 0]), 1.0, atol=1e-5)


def test_upsample_downsample_shapes_and_dc(rand_img):
    f = setup_filter([1., 3., 3., 1.])
    upv = upsample2d(rand_img, f, up=2)
    assert upv.shape == (2, 16, 16, 3)
    dnv = downsample2d(rand_img, f, down=2)
    assert dnv.shape == (2, 4, 4, 3)
    # up keeps DC magnitude (gain=up^2 compensates zero-insertion)
    const = jnp.ones_like(rand_img)
    upc = upsample2d(const, f, up=2)
    assert np.isclose(float(upc[0, 8, 8, 0]), 1.0, atol=1e-4)
    dnc = downsample2d(const, f, down=2)
    assert np.isclose(float(dnc[0, 2, 2, 0]), 1.0, atol=1e-4)


def test_upsample_then_downsample_roundtrip(rand_img):
    '''down(up(x)) ≈ x in the interior (antialiased identity).'''
    f = setup_filter([1., 3., 3., 1.])
    y = downsample2d(upsample2d(rand_img, f, up=2), f, down=2)
    assert y.shape == rand_img.shape


def test_upfirdn2d_gradients(key):
    f = setup_filter([1., 2., 1.])
    x = jax.random.normal(key, (1, 6, 6, 2))

    def loss(x):
        return jnp.sum(upfirdn2d(x, f, up=2, padding=1) ** 2)

    # first and second order
    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    h = jax.grad(lambda x: jnp.sum(jax.grad(loss)(x) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(h)))


# ---- bias_act ----

def test_bias_act_matches_formula(key):
    x = jax.random.normal(key, (4, 8))
    b = jnp.arange(8.0) / 8.0
    y = bias_act(x, b, act='lrelu')
    want = jax.nn.leaky_relu(x + b, 0.2) * np.sqrt(2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5)

    y = bias_act(x, b, act='linear', gain=2.0, clamp=0.5)
    want = jnp.clip((x + b) * 2.0, -0.5, 0.5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5)


def test_bias_act_dim(key):
    x = jax.random.normal(key, (2, 5, 4))
    b = jnp.ones((5,))
    y = bias_act(x, b, dim=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x + b[None, :, None]), rtol=1e-5)


def test_bias_act_default_gains():
    x = jnp.array([1.0])
    assert np.isclose(float(bias_act(x, act='relu')[0]), np.sqrt(2), rtol=1e-5)
    assert np.isclose(float(bias_act(x, act='tanh')[0]), np.tanh(1.0), rtol=1e-5)
    assert np.isclose(float(bias_act(x, act='swish')[0]),
                      float(jax.nn.silu(x)[0]) * np.sqrt(2), rtol=1e-5)


def test_bias_act_second_order_grad(key):
    x = jax.random.normal(key, (8,))
    b = jnp.zeros((8,))

    def loss(b):
        return jnp.sum(bias_act(x, b, act='swish') ** 2)
    h = jax.hessian(loss)(b)
    assert bool(jnp.all(jnp.isfinite(h)))


# ---- filtered_lrelu ----

def test_filtered_lrelu_matches_composition(key):
    '''filtered_lrelu == bias_act + upfirdn2d composition (reference ref impl).'''
    x = jax.random.normal(key, (2, 8, 8, 4))
    b = jnp.linspace(-0.5, 0.5, 4)
    fu = setup_filter([1., 3., 3., 1.])
    fd = setup_filter([1., 3., 3., 1.])
    up, down, pad = 2, 2, 3

    y = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad,
                       gain=np.sqrt(2), slope=0.2, clamp=None)

    z = bias_act(x, b)
    z = upfirdn2d(z, fu, up=up, padding=pad, gain=up ** 2)
    z = bias_act(z, act='lrelu', alpha=0.2, gain=np.sqrt(2))
    z = upfirdn2d(z, fd, down=down)
    np.testing.assert_allclose(np.asarray(y), np.asarray(z), rtol=1e-4, atol=1e-5)


def test_filtered_lrelu_output_shape(key):
    '''Output size formula from reference filtered_lrelu.py:136-137.'''
    x = jax.random.normal(key, (1, 16, 16, 2))
    fu = setup_filter([1., 3., 3., 1.], gain=1)
    fd = setup_filter([1., 3., 3., 1.])
    y = filtered_lrelu(x, fu, fd, up=2, down=2, padding=3)
    assert y.shape[1] == (16 * 2 + 6 - 3 - 3 + 1) // 2


def test_filtered_lrelu_gradients(key):
    x = jax.random.normal(key, (1, 8, 8, 2))
    fu = setup_filter([1., 2., 1.])
    b = jnp.zeros((2,))

    def loss(x, b):
        return jnp.sum(filtered_lrelu(x, fu, fu, b, up=2, down=2, padding=2) ** 2)
    gx, gb = jax.grad(loss, argnums=(0, 1))(x, b)
    assert gx.shape == x.shape and gb.shape == b.shape
    # double backward (R1-through-filtered_lrelu property)
    h = jax.grad(lambda x: jnp.sum(jax.grad(loss, argnums=0)(x, b) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(h)))


def test_filtered_lrelu_packed_matches_store(key):
    '''memory='pack' (2-bit gate residual custom_vjp, the TPU translation of
    the reference sign tensor, filtered_lrelu.py:199-226 / .cpp:80-92) is
    exact vs plain autodiff: forward, grads, and double-backward.'''
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 6))
    b = jax.random.normal(k2, (6,)) * 0.1
    fu = setup_filter([1., 3., 3., 1.])
    fd = setup_filter([1., 2., 1.])
    kw = dict(up=2, down=2, padding=3, gain=np.sqrt(2), slope=0.2, clamp=0.5)

    y0 = filtered_lrelu(x, fu, fd, b, **kw, memory='store')
    y1 = filtered_lrelu(x, fu, fd, b, **kw, memory='pack')
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-7)

    def loss(x, b, memory):
        return jnp.sum(filtered_lrelu(x, fu, fd, b, **kw, memory=memory) ** 3)
    g0 = jax.grad(loss, argnums=(0, 1))(x, b, 'store')
    g1 = jax.grad(loss, argnums=(0, 1))(x, b, 'pack')
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]), atol=1e-6)

    # double backward (the PL-penalty-through-G property StyleGAN3 needs)
    def gnorm(x, memory):
        return jnp.sum(jax.grad(loss, argnums=0)(x, b, memory) ** 2)
    h0 = jax.grad(gnorm)(x, 'store')
    h1 = jax.grad(gnorm)(x, 'pack')
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=1e-6)


def test_filtered_lrelu_remat_matches_store(key):
    '''memory='remat' (per-layer jax.checkpoint, the round-4 verdict's
    memory-scaling lever) is numerically identical to plain autodiff:
    forward, grads, and double-backward.'''
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 6))
    b = jax.random.normal(k2, (6,)) * 0.1
    fu = setup_filter([1., 3., 3., 1.])
    fd = setup_filter([1., 2., 1.])
    kw = dict(up=2, down=2, padding=3, gain=np.sqrt(2), slope=0.2, clamp=0.5)

    y0 = filtered_lrelu(x, fu, fd, b, **kw, memory='store')
    y1 = filtered_lrelu(x, fu, fd, b, **kw, memory='remat')
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-7)

    def loss(x, b, memory):
        return jnp.sum(filtered_lrelu(x, fu, fd, b, **kw, memory=memory) ** 3)
    g0 = jax.grad(loss, argnums=(0, 1))(x, b, 'store')
    g1 = jax.grad(loss, argnums=(0, 1))(x, b, 'remat')
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]), atol=1e-6)

    def gnorm(x, memory):
        return jnp.sum(jax.grad(loss, argnums=0)(x, b, memory) ** 2)
    h0 = jax.grad(gnorm)(x, 'store')
    h1 = jax.grad(gnorm)(x, 'remat')
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=1e-6)


@pytest.mark.parametrize('layout', ['int32', 'lanes', 'chan', 'u8'])
def test_filtered_lrelu_packed_residual_is_small(key, layout):
    '''The backward residual really is the packed gate tensor, and every
    layout round-trips exactly. Default 'int32' packs 16 codes per uint32
    word (4x fewer bytes than one-byte-per-code; uint8 shift/or layouts
    crash the TPU compiler at StyleGAN3-256 batch-32 shapes — see the
    layout table in ops/filtered_lrelu.py).'''
    from animeface_tpu.ops.filtered_lrelu import (
        _pack_gate_codes, _unpack_gate_codes)
    codes = jax.random.randint(key, (2, 6, 4, 10), 0, 3, dtype=jnp.int32)
    codes = codes.astype(jnp.uint8)
    packed = _pack_gate_codes(codes, layout)
    expected_bytes = {
        # channel padded to the word width; 2 bits per code when bit-packed
        'int32': 2 * 6 * (4 * 16) // 16 * 4,
        'lanes': 2 * 6 * (4 * 12) // 4,
        'chan': 2 * 6 * 4 * (12 // 4),
        'u8': 2 * 6 * 4 * 10,
    }[layout]
    assert packed.size * packed.dtype.itemsize == expected_bytes
    got = _unpack_gate_codes(packed, (2, 6, 4, 10), layout)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(codes))


def test_filtered_lrelu_packed_rgb_and_nofilter_configs(key):
    '''Degenerate configs (no filters, no bias, up=down=1, slope=1) used by
    StyleGAN3's rgb layer take the packed path unchanged.'''
    x = jax.random.normal(key, (2, 8, 8, 3))
    kw = dict(up=1, down=1, padding=0, gain=1.0, slope=1.0, clamp=0.3)
    y0 = filtered_lrelu(x, None, None, None, **kw, memory='store')
    y1 = filtered_lrelu(x, None, None, None, **kw, memory='pack')
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-7)
    g0 = jax.grad(lambda x: jnp.sum(filtered_lrelu(x, None, None, None, **kw,
                                                   memory='store') ** 2))(x)
    g1 = jax.grad(lambda x: jnp.sum(filtered_lrelu(x, None, None, None, **kw,
                                                   memory='pack') ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)


# ---- conv2d_resample ----

def test_conv2d_resample_plain_matches_lax(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 4))
    w = jax.random.normal(k2, (3, 3, 4, 6)) * 0.1
    y = conv2d_resample(x, w, padding=1)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_conv2d_resample_updown_shapes(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 4))
    f = setup_filter([1., 3., 3., 1.])
    w1 = jax.random.normal(k2, (3, 3, 4, 8)) * 0.1
    assert conv2d_resample(x, w1, f, up=2, padding=1).shape == (2, 16, 16, 8)
    assert conv2d_resample(x, w1, f, down=2, padding=1).shape == (2, 4, 4, 8)
    w2 = jax.random.normal(k2, (1, 1, 4, 8)) * 0.1
    assert conv2d_resample(x, w2, f, up=2).shape == (2, 16, 16, 8)
    assert conv2d_resample(x, w2, f, down=2).shape == (2, 4, 4, 8)


def test_conv2d_resample_up_equals_explicit_composition(key):
    '''General up path == upfirdn2d(up) then conv (the semantic definition).'''
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (1, 6, 6, 3))
    w = jax.random.normal(k2, (3, 3, 3, 5)) * 0.1
    f = setup_filter([1., 3., 3., 1.])
    up, pad = 2, 1
    got = conv2d_resample(x, w, f, up=up, padding=pad)

    fw, fh = 4, 4
    px0 = pad + (fw + up - 1) // 2
    px1 = pad + (fw - up) // 2
    z = upfirdn2d(x, f, up=up, padding=[px0, px1, px0, px1], gain=up ** 2)
    want = jax.lax.conv_general_dilated(
        z, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_conv2d_resample_groups(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 4))
    w = jax.random.normal(k2, (3, 3, 2, 4)) * 0.1  # groups=2
    y = conv2d_resample(x, w, groups=2, padding=1)
    assert y.shape == (2, 8, 8, 4)


# ---- grid_sample ----

def test_grid_sample_identity(key):
    x = jax.random.normal(key, (2, 8, 8, 3))
    ys, xs = jnp.meshgrid(jnp.arange(8), jnp.arange(8), indexing='ij')
    gx = (xs + 0.5) / 4.0 - 1.0
    gy = (ys + 0.5) / 4.0 - 1.0
    grid = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (2, 8, 8, 2))
    y = grid_sample(x, grid)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_grid_sample_matches_torch(key):
    import torch
    import torch.nn.functional as F
    x = jax.random.normal(key, (1, 6, 6, 2))
    k2 = jax.random.split(key)[0]
    grid = jax.random.uniform(k2, (1, 5, 5, 2), minval=-1.3, maxval=1.3)
    got = grid_sample(x, grid)
    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    tg = torch.tensor(np.asarray(grid))
    want = F.grid_sample(tx, tg, mode='bilinear', padding_mode='zeros',
                         align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_grid_sample_double_backward(key):
    x = jax.random.normal(key, (1, 4, 4, 1))
    grid = jnp.zeros((1, 2, 2, 2))

    def loss(grid):
        return jnp.sum(grid_sample(x, grid) ** 2)
    h = jax.grad(lambda g: jnp.sum(jax.grad(loss)(g) ** 2))(grid)
    assert bool(jnp.all(jnp.isfinite(h)))


def test_fma():
    assert float(fma(jnp.float32(2), jnp.float32(3), jnp.float32(4))) == 10.0


# ---------------- pallas filtered_lrelu kernel ----------------

class TestFilteredLreluPallas:
    '''Fused polyphase kernel vs the XLA composition oracle (interpret mode
    on CPU; the same kernel compiles for TPU via Mosaic).'''

    def _run(self, C=128, pad=11, clamp=None, bias=True, H=16, seed=0,
             variant=None):
        import numpy as np
        from unittest import mock
        from jax.experimental import pallas as pl
        from animeface_tpu.ops.filtered_lrelu import filtered_lrelu
        from animeface_tpu.ops import pallas_kernels
        from animeface_tpu.ops.upfirdn2d import setup_filter

        key = jax.random.PRNGKey(seed)
        fu = setup_filter(np.hanning(12), normalize=True)
        x = jax.random.normal(key, (2, H, H, C), jnp.float32)
        b = (jax.random.normal(key, (C,), jnp.float32) * 0.3) if bias else None
        ref = filtered_lrelu(x, fu, fu, b, up=2, down=2, padding=pad,
                             clamp=clamp, impl='xla')
        # kernels auto-select interpret mode off-TPU
        got = pallas_kernels.filtered_lrelu_pallas(
            x, np.asarray(fu), np.asarray(fu), b, 2, 2,
            (pad, pad, pad, pad), float(np.sqrt(2)), 0.2, clamp, False,
            variant=variant)
        assert got is not None
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6)

    def test_shift_variant(self):
        # round-3 shift variant: 2D overlapped tiles, VPU FIR shift-adds
        self._run(variant='shift')
        self._run(C=256, clamp=0.5, variant='shift')
        self._run(H=40, bias=False, variant='shift')

    def test_shift_variant_padded_w_tiles(self):
        # force a plan whose TW does not divide out_w (padded output width
        # + overlapped H tiles)
        from unittest import mock
        from animeface_tpu.ops import pallas_kernels
        with mock.patch.object(pallas_kernels, '_flrelu_shift_tile_plan',
                               lambda *a, **k: (8, 32, 48)):
            self._run(H=40, variant='shift')

    def test_basic(self):
        self._run()

    def test_gather_variant_multitile(self):
        # round-4 gather variant: NT>1 row bands (two shifted block views),
        # NCD>1 W-chunks, multiple channel blocks
        self._run(H=40, variant='gather')                 # NT > 1
        self._run(H=80, C=256, variant='gather')          # NCD=2, 2 c-blocks
        self._run(H=80, clamp=0.5, bias=False, variant='gather')

    def test_gather_variant_forced_small_tiles(self):
        # force the smallest legal TH so every step concatenates two views
        from unittest import mock
        from animeface_tpu.ops import pallas_kernels
        with mock.patch.object(pallas_kernels, '_gather_plan',
                               lambda *a, **k: 16):
            self._run(H=80, variant='gather')

    def test_bias_and_clamp(self):
        self._run(C=256, clamp=0.5)

    def test_no_bias(self):
        self._run(bias=False)

    def test_fallback_out_of_scope(self):
        import numpy as np
        from animeface_tpu.ops import pallas_kernels
        from animeface_tpu.ops.upfirdn2d import setup_filter
        fu = np.asarray(setup_filter(np.hanning(12), normalize=True))
        x = jnp.zeros((1, 16, 16, 64))      # C not a multiple of 128
        assert pallas_kernels.filtered_lrelu_pallas(
            x, fu, fu, None, 2, 2, (11, 11, 11, 11), 1.4, 0.2, None,
            False) is None
        x = jnp.zeros((1, 16, 16, 128))     # up != 2
        assert pallas_kernels.filtered_lrelu_pallas(
            x, fu, fu, None, 1, 2, (11, 11, 11, 11), 1.4, 0.2, None,
            False) is None


class TestBiasActPallas:
    def test_matches_xla(self):
        import numpy as np
        from unittest import mock
        from jax.experimental import pallas as pl
        from animeface_tpu.ops.bias_act import bias_act
        from animeface_tpu.ops import pallas_kernels

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 8, 8, 128), jnp.float32)
        b = jax.random.normal(key, (128,), jnp.float32)
        for act, clamp in (('lrelu', -1.0), ('swish', 0.7), ('linear', -1.0)):
            ref = bias_act(x, b, act=act,
                           clamp=None if clamp < 0 else clamp, impl='xla')
            got = pallas_kernels.bias_act_pallas(
                x, b, -1, act, 0.2,
                float(np.sqrt(2)) if act in ('lrelu', 'swish') else 1.0,
                clamp)
            assert got is not None
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6)

    def test_fallback(self):
        from animeface_tpu.ops import pallas_kernels
        x = jnp.zeros((2, 4, 4, 64))       # C not multiple of 128
        assert pallas_kernels.bias_act_pallas(
            x, jnp.zeros((64,)), -1, 'lrelu', 0.2, 1.4, -1.0) is None
        assert pallas_kernels.bias_act_pallas(     # no bias
            jnp.zeros((2, 4, 4, 128)), None, -1, 'lrelu', 0.2, 1.4,
            -1.0) is None


class TestGradfixWrappers:
    def test_conv2d_matches_lax_and_double_grad(self):
        import numpy as np
        from animeface_tpu.ops import gradfix
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 8, 8, 4))
        w = jax.random.normal(key, (3, 3, 4, 6)) * 0.1
        y = gradfix.conv2d(x, w, padding=1)
        assert y.shape == (2, 8, 8, 6)
        # arbitrary-order gradients compose (the whole point of gradfix)
        g = jax.grad(lambda x: jnp.sum(gradfix.conv2d(x, w, padding=1) ** 2))
        gg = jax.grad(lambda x: jnp.sum(g(x) ** 2))(x)
        assert gg.shape == x.shape and bool(jnp.all(jnp.isfinite(gg)))

    def test_no_weight_gradients(self):
        from animeface_tpu.ops import gradfix
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (1, 4, 4, 2))
        w = jax.random.normal(key, (3, 3, 2, 2)) * 0.1

        def loss(w):
            with gradfix.no_weight_gradients():
                return jnp.sum(gradfix.conv2d(x, w, padding=1))
        gw = jax.grad(loss)(w)
        assert float(jnp.max(jnp.abs(gw))) == 0.0

    def test_conv_transpose2d_matches_torch(self):
        import numpy as np
        torch = pytest.importorskip('torch')
        key = jax.random.PRNGKey(2)
        x = np.asarray(jax.random.normal(key, (2, 5, 5, 3)), np.float32)
        w = np.asarray(jax.random.normal(key, (4, 4, 3, 6)) * 0.1, np.float32)
        from animeface_tpu.ops import gradfix
        y = gradfix.conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                     stride=2, padding=1)
        # torch: NCHW, weight [in, out, kh, kw]
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
        ref = torch.nn.functional.conv_transpose2d(xt, wt, stride=2, padding=1)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
