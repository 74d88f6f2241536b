'''ADA AugmentPipe tests: identity at p=0, deterministic parity against the
reference pipeline (executed on CPU via its pure-torch fallback path in
debug_percentile mode), controller heuristic, and gradient flow.'''

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animeface_tpu.nnutils.ada import (
    AugmentPipe, make_ada_pipe, ada_init_state, ada_update_p,
)


@pytest.fixture()
def img(key):
    # smooth low-frequency content (interior comparison robust to borders)
    x = jax.random.normal(key, (2, 8, 8, 3))
    x = jax.image.resize(x, (2, 32, 32, 3), method='bilinear')
    return jnp.clip(x, -1, 1)


def _torch_pipe(**knobs):
    '''Instantiate the reference AugmentPipe (CPU, ref-op fallback).'''
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from thirdparty.ada.augment import AugmentPipe as TorchPipe
    return TorchPipe(**knobs)


def _run_torch(pipe, img_nhwc, p, dbg):
    import torch
    with torch.no_grad():
        pipe.p.copy_(torch.tensor(float(p)))
        x = torch.tensor(np.asarray(img_nhwc)).permute(0, 3, 1, 2)
        y = pipe(x, debug_percentile=dbg)
        return y.permute(0, 2, 3, 1).numpy()


def test_identity_when_p_zero(img, key):
    pipe = make_ada_pipe()
    out = pipe(key, img, p=0.0)
    # geometric path still resamples (up->warp->down); interior must be close
    inner = (slice(None), slice(6, -6), slice(6, -6), slice(None))
    np.testing.assert_allclose(np.asarray(out[inner]), np.asarray(img[inner]),
                               atol=5e-2)


@pytest.mark.parametrize('knobs', [
    dict(brightness=1), dict(contrast=1), dict(lumaflip=1), dict(hue=1),
    dict(saturation=1),
    dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
])
def test_color_parity_with_reference(img, key, knobs):
    '''Color-only pipeline has no geometry -> exact parity expected.'''
    pipe = AugmentPipe(**knobs)
    ref = _torch_pipe(**knobs)
    for dbg in (0.2, 0.5, 0.9):
        got = np.asarray(pipe(key, img, p=1.0, debug_percentile=dbg))
        want = _run_torch(ref, img, 1.0, dbg)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cutout_parity_with_reference(img, key):
    knobs = dict(cutout=1)
    pipe = AugmentPipe(**knobs)
    ref = _torch_pipe(**knobs)
    got = np.asarray(pipe(key, img, p=1.0, debug_percentile=0.3))
    want = _run_torch(ref, img, 1.0, 0.3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_imgfilter_parity_with_reference(img, key):
    knobs = dict(imgfilter=1)
    pipe = AugmentPipe(**knobs)
    ref = _torch_pipe(**knobs)
    got = np.asarray(pipe(key, img, p=1.0, debug_percentile=0.7))
    want = _run_torch(ref, img, 1.0, 0.7)
    # reflect-padding boundary handling matches; allow fp tolerance
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_geometric_parity_interior(img, key):
    '''Geometric path: margins are static here vs dynamic in the reference,
    so borders differ; the interior of the warp must agree.'''
    knobs = dict(xflip=1, rotate90=1, xint=1)
    pipe = AugmentPipe(**knobs)
    ref = _torch_pipe(**knobs)
    for dbg in (0.1, 0.6, 0.9):
        got = np.asarray(pipe(key, img, p=1.0, debug_percentile=dbg))
        want = _run_torch(ref, img, 1.0, dbg)
        inner = (slice(None), slice(8, -8), slice(8, -8), slice(None))
        np.testing.assert_allclose(got[inner], want[inner], rtol=5e-2,
                                   atol=5e-2)


def test_geometric_rotation_parity_interior(img, key):
    knobs = dict(scale=1, rotate=1, aniso=1, xfrac=1)
    pipe = AugmentPipe(**knobs)
    ref = _torch_pipe(**knobs)
    got = np.asarray(pipe(key, img, p=1.0, debug_percentile=0.4))
    want = _run_torch(ref, img, 1.0, 0.4)
    inner = (slice(None), slice(10, -10), slice(10, -10), slice(None))
    np.testing.assert_allclose(got[inner], want[inner], rtol=5e-2, atol=5e-2)


def test_pipe_is_jittable_and_differentiable(img, key):
    pipe = make_ada_pipe()

    @jax.jit
    def f(x, p):
        return jnp.sum(pipe(key, x, p) ** 2)

    g = jax.grad(f)(img, jnp.float32(0.5))
    assert g.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_ada_controller():
    state = ada_init_state(batch_size=8, interval=2, target_kimg=1,
                           threshold=0.6)
    # D(real) strongly positive -> overfitting signal -> p goes up after
    # `interval` updates
    probs = jnp.ones((8, 1)) * 3.0
    state = ada_update_p(state, probs)
    assert float(state['p']) == 0.0   # not yet at interval
    state = ada_update_p(state, probs)
    assert float(state['p']) > 0.0
    assert int(state['num_iter']) == 0  # counter reset
    # negative logits -> p decreases (clamped at 0)
    state = ada_init_state(batch_size=8, interval=1, target_kimg=1)
    state = ada_update_p(state, -probs)
    assert float(state['p']) == 0.0


def test_ada_tick_cadence():
    '''R1-only iters advance the cadence via ada_tick without diluting the
    sign statistic (VERDICT r3 item 4: one tick per training iteration, like
    the reference's every-step accounting, nnutils/ada.py:26-36).'''
    from animeface_tpu.nnutils.ada import ada_tick

    probs = jnp.ones((8, 1)) * 3.0          # strong overfitting signal
    # interval=4 with an R1 iter every 4th step: [adv, adv, adv, tick]
    state = ada_init_state(batch_size=8, interval=4, target_kimg=1,
                           threshold=0.6)
    for i in range(3):
        state = ada_update_p(state, probs)
        assert float(state['p']) == 0.0
    state = ada_tick(state)                   # 4th iter: R1-only
    # window closed on the tick — p adjusted using only the 24 accumulated
    # samples (mean sign = 1.0 > 0.6 -> p rises), counters reset
    assert float(state['p']) > 0.0
    assert int(state['num_iter']) == 0
    assert float(state['signsum']) == 0.0
    assert float(state['count']) == 0.0
    # an all-tick window (no logits at all) holds p
    p_before = float(state['p'])
    for _ in range(4):
        state = ada_tick(state)
    assert float(state['p']) == p_before
