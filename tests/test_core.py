'''Unit tests for the core runtime: losses, penalties, EMA, rng, init, layers, utils.'''

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animeface_tpu.nnutils import (
    KeyGen, sample_nnoise, sample_unoise, update_ema, freeze, count_params,
)
from animeface_tpu.nnutils.loss import (
    GANLoss, LSGANLoss, NonSaturatingLoss, WGANLoss, HingeLoss,
    gradient_penalty, r1_regularizer,
)
from animeface_tpu.nnutils.initialize import apply_init
from animeface_tpu.nnutils.module import MiniBatchStdDev, get_activation
from animeface_tpu.utils import EasyDict, Status, make_image_grid


# ---- losses (numerical parity with reference torch formulas) ----

def _torch_reference_losses(real, fake):
    import torch
    import torch.nn.functional as F
    tr, tf = torch.tensor(np.asarray(real)), torch.tensor(np.asarray(fake))
    out = {}
    bce = torch.nn.BCEWithLogitsLoss()
    out['gan_d'] = (bce(tr, torch.ones_like(tr)) + bce(tf, torch.zeros_like(tf))).item()
    out['gan_g'] = bce(tf, torch.ones_like(tf)).item()
    out['ls_d'] = (0.5 * F.mse_loss(tr, torch.ones_like(tr)) + 0.5 * F.mse_loss(tf, torch.zeros_like(tf))).item()
    out['ls_g'] = (0.5 * F.mse_loss(tf, torch.ones_like(tf))).item()
    out['ns_d'] = (F.softplus(-tr).mean() + F.softplus(tf).mean()).item()
    out['ns_g'] = F.softplus(-tf).mean().item()
    out['w_d'] = (tf.mean() - tr.mean()).item()
    out['w_g'] = (-tf.mean()).item()
    out['h_d'] = (F.relu(1 - tr).mean() + F.relu(1 + tf).mean()).item()
    out['h_g'] = (-tf.mean()).item()
    return out


def test_gan_losses_match_torch_reference(key):
    k1, k2 = jax.random.split(key)
    real = jax.random.normal(k1, (16, 1))
    fake = jax.random.normal(k2, (16, 1))
    ref = _torch_reference_losses(real, fake)

    assert np.isclose(float(GANLoss().d_loss(real, fake)), ref['gan_d'], atol=1e-5)
    assert np.isclose(float(GANLoss().g_loss(fake)), ref['gan_g'], atol=1e-5)
    assert np.isclose(float(LSGANLoss().d_loss(real, fake)), ref['ls_d'], atol=1e-5)
    assert np.isclose(float(LSGANLoss().g_loss(fake)), ref['ls_g'], atol=1e-5)
    assert np.isclose(float(NonSaturatingLoss().d_loss(real, fake)), ref['ns_d'], atol=1e-5)
    assert np.isclose(float(NonSaturatingLoss().g_loss(fake)), ref['ns_g'], atol=1e-5)
    assert np.isclose(float(WGANLoss().d_loss(real, fake)), ref['w_d'], atol=1e-5)
    assert np.isclose(float(WGANLoss().g_loss(fake)), ref['w_g'], atol=1e-5)
    assert np.isclose(float(HingeLoss().d_loss(real, fake)), ref['h_d'], atol=1e-5)
    assert np.isclose(float(HingeLoss().g_loss(fake)), ref['h_g'], atol=1e-5)


def test_loss_return_all(key):
    real = jax.random.normal(key, (8, 1))
    fake = real + 1.0
    loss, rl, fl = HingeLoss(return_all=True).d_loss(real, fake)
    assert np.isclose(float(loss), float(rl) + float(fl))


# ---- penalties ----

def test_r1_regularizer_quadratic_d():
    # D(x) = sum(a * x); grad = a everywhere -> R1 = ||a||^2 / 2
    a = jnp.arange(12.0).reshape(1, 2, 2, 3) / 10.0
    d_apply = lambda x: jnp.sum(x * a, axis=(1, 2, 3))
    x = jnp.ones((4, 2, 2, 3))
    r1 = r1_regularizer(x, d_apply)
    expected = float(jnp.sum(a * a)) / 2.0
    assert np.isclose(float(r1), expected, atol=1e-6)


def test_gradient_penalty_linear_d(key):
    # D(x) = c*sum(x): grad norm = c*sqrt(numel); center=1
    c = 0.5
    d_apply = lambda x: c * jnp.sum(x, axis=(1, 2, 3))
    real = jnp.zeros((4, 4, 4, 3))
    fake = jnp.ones((4, 4, 4, 3))
    gp = gradient_penalty(key, real, fake, d_apply, center=1.0)
    expected = (c * np.sqrt(4 * 4 * 3) - 1.0) ** 2
    assert np.isclose(float(gp), expected, atol=1e-5)


def test_penalty_is_double_differentiable(key):
    '''The property conv2d_gradfix existed for: outer grad through the penalty.'''
    w = jnp.ones((27, 1)) * 0.1
    x = jax.random.normal(key, (2, 3, 3, 3))

    def loss_fn(w):
        d_apply = lambda img: img.reshape(img.shape[0], -1) @ w
        return r1_regularizer(x, d_apply)

    g = jax.grad(loss_fn)(w)
    assert g.shape == w.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


# ---- ema / rng / init ----

def test_update_ema():
    p = {'w': jnp.ones((3,)) * 2.0}
    e = {'w': jnp.zeros((3,))}
    e2 = update_ema(p, e, decay=0.5)
    assert np.allclose(np.asarray(e2['w']), 1.0)
    boot = update_ema(p, e, decay=0.0)
    assert np.allclose(np.asarray(boot['w']), 2.0)


def test_keygen_deterministic():
    a, b = KeyGen(42), KeyGen(42)
    assert np.allclose(np.asarray(sample_nnoise(a(), (4,))), np.asarray(sample_nnoise(b(), (4,))))
    z = sample_unoise(KeyGen(0)(), (1000,), 0.0, 1.0)
    assert float(z.min()) >= 0.0 and float(z.max()) <= 1.0


def test_keygen_state_roundtrip():
    kg = KeyGen(7)
    kg()
    state = kg.state_dict()
    kg2 = KeyGen(0)
    kg2.load_state_dict(state)
    assert np.allclose(np.asarray(sample_nnoise(kg(), (3,))), np.asarray(sample_nnoise(kg2(), (3,))))


def test_apply_init(key):
    params = {'layer': {'kernel': jnp.zeros((4, 4)), 'bias': jnp.ones((4,))}}
    out = apply_init(key, params, 'N002')
    assert float(jnp.std(out['layer']['kernel'])) > 0.0
    assert float(jnp.std(out['layer']['kernel'])) < 0.1
    assert np.allclose(np.asarray(out['layer']['bias']), 0.0)


def test_freeze_blocks_gradient():
    def loss(p):
        fp = freeze(p)
        return jnp.sum(fp['w'] ** 2) + jnp.sum(p['v'])
    g = jax.grad(loss)({'w': jnp.ones((2,)), 'v': jnp.ones((2,))})
    assert np.allclose(np.asarray(g['w']), 0.0)
    assert np.allclose(np.asarray(g['v']), 1.0)


# ---- layers ----

def test_minibatch_stddev_shapes_and_semantics(key):
    m = MiniBatchStdDev(group_size=4)
    x = jax.random.normal(key, (8, 4, 4, 16))
    y = m.apply({}, x)
    assert y.shape == (8, 4, 4, 17)
    # identical samples within a group -> zero stddev channel
    x0 = jnp.broadcast_to(x[:1], x.shape)
    y0 = m.apply({}, x0)
    assert float(jnp.abs(y0[..., -1]).max()) < 1e-3


def test_get_activation():
    assert float(get_activation('lrelu')(jnp.array(-1.0))) == pytest.approx(-0.2)
    assert float(get_activation('relu')(jnp.array(-1.0))) == 0.0


# ---- utils ----

def test_easydict():
    d = EasyDict()
    d.a = 1
    assert d['a'] == 1 and d.a == 1
    del d.a
    with pytest.raises(AttributeError):
        _ = d.a


def test_status(tmp_path):
    s = Status(max_iters=3, bar=False, log_file=str(tmp_path / 'log.txt'))
    for i in range(3):
        s.update(G=float(i), D=jnp.float32(i * 2))
    assert s.is_end()
    sd = s.state_dict()
    assert sd['batches_done'] == 3
    s2 = Status(max_iters=3, bar=False)
    s2.load_state_dict(sd)
    assert s2.batches_done == 3
    s.plot_loss(str(tmp_path / 'loss.png'))
    assert (tmp_path / 'loss.png').exists()


def test_status_loss_tail_and_nan_guard():
    '''VERDICT r3 item 7: public accessor + uneven-length window logic.'''
    from animeface_tpu.nnutils.trainer import check_sustained_nan

    nan = float('nan')
    s = Status(max_iters=100, bar=False)
    # 12 steps of NaN G-loss; a fresh key 'p' appears only at step 10
    for i in range(12):
        if i >= 10:
            s.update(G=nan, p=0.5)
        else:
            s.update(G=nan)
    tails = s.loss_tail(10)
    assert len(tails['G']) == 10 and len(tails['p']) == 2
    # mature all-NaN series trips the guard; the short 'p' series doesn't veto
    with pytest.raises(FloatingPointError):
        check_sustained_nan(s, 'test')

    # a finite value inside the window keeps it quiet
    s2 = Status(max_iters=100, bar=False)
    for i in range(12):
        s2.update(G=nan if i != 8 else 0.1)
    check_sustained_nan(s2, 'test')

    # round-4 advisor finding: an always-finite aux metric (alpha/p) must NOT
    # veto the guard when an actual loss series is sustained-non-finite
    s4 = Status(max_iters=100, bar=False)
    for i in range(12):
        s4.update(d=nan, g=nan, alpha=min(1.0, i / 10))
    with pytest.raises(FloatingPointError):
        check_sustained_nan(s4, 'test')

    # nothing mature yet -> no-op (never raises on short history)
    s3 = Status(max_iters=100, bar=False)
    for _ in range(5):
        s3.update(G=nan)
    check_sustained_nan(s3, 'test')


def test_make_image_grid():
    a = np.zeros((2, 4, 4, 3))
    b = np.ones((2, 4, 4, 3))
    g = make_image_grid(a, b)
    assert g.shape == (4, 4, 4, 3)
    assert np.allclose(g[0], 0) and np.allclose(g[1], 1)


def test_count_params():
    assert count_params({'a': jnp.zeros((2, 3)), 'b': jnp.zeros((5,))}) == 11


def test_vgg_loss(key):
    import warnings
    from animeface_tpu.nnutils.loss.vgg import VGGLoss, gram_matrix
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        vl = VGGLoss(vgg=16, p=2)
    a = jax.random.normal(key, (2, 32, 32, 3)) * 0.5
    b = a + 0.1
    s = float(vl.style_loss(a, b))
    c = float(vl.content_loss(a, b))
    v = float(vl.vgg_loss(a, b, p=1))
    assert all(np.isfinite([s, c, v])) and all(x >= 0 for x in (s, c, v))
    assert float(vl.vgg_loss(a, a)) == 0.0
    g = gram_matrix(jnp.ones((1, 4, 4, 8)))
    assert g.shape == (1, 8, 8)
    # gradients flow into inputs but trunk is frozen
    grad = jax.grad(lambda x: vl.content_loss(a, x))(b)
    assert float(jnp.abs(grad).sum()) > 0


def test_checkio(capsys):
    from animeface_tpu.nnutils.debug import checkio
    logs = []
    checkio.print_func = staticmethod(logs.append)

    @checkio()
    def f(x):
        return x * 2

    f(jnp.ones((2, 3)))
    assert len(logs) == 2
    assert '(2, 3)' in logs[0]

    # set_all_funcs rewires EXISTING wrappers retroactively (reference
    # nnutils/debug.py:145 semantics)
    checkio.set_all_funcs('minmax')
    logs.clear()
    f(jnp.ones((2, 3)))
    assert any('min=1' in line for line in logs), logs
    checkio.set_all_funcs('size')


def test_rand_translation_matches_gather_reference(key):
    '''dynamic-slice formulation == pointwise-gather reference semantics.'''
    from animeface_tpu.nnutils.diffaugment import rand_translation
    x = jax.random.normal(key, (4, 16, 16, 3))
    got = rand_translation(key, x)

    # reference gather formulation (the torch DiffAugment port)
    N, H, W, C = x.shape
    sh = sw = int(16 * 0.125 + 0.5)
    kh, kw = jax.random.split(key)
    th = jax.random.randint(kh, (N, 1, 1), -sh, sh + 1)
    tw = jax.random.randint(kw, (N, 1, 1), -sw, sw + 1)
    gh = jax.lax.broadcasted_iota(jnp.int32, (N, H, W), 1)
    gw = jax.lax.broadcasted_iota(jnp.int32, (N, H, W), 2)
    gh = jnp.clip(gh + th + 1, 0, H + 1)
    gw = jnp.clip(gw + tw + 1, 0, W + 1)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = x_pad[jnp.arange(N)[:, None, None], gh, gw]

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_diffaugment_policies(key):
    from animeface_tpu.nnutils.diffaugment import diff_augment
    x = jax.random.normal(key, (4, 16, 16, 3))
    assert diff_augment(key, x, '').shape == x.shape
    for policy in ('color', 'translation', 'cutout', 'color,translation,cutout'):
        out = diff_augment(key, x, policy)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))
        assert not np.allclose(np.asarray(out), np.asarray(x))
    # differentiable
    g = jax.grad(lambda x: jnp.sum(diff_augment(key, x, 'color,translation,cutout') ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
