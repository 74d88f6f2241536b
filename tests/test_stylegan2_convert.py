'''Generator-level golden parity (VERDICT r1 item 3): reference torch
StyleGAN2 G weights -> tools/convert_stylegan2_weights.py -> flax Generator
must synthesize the SAME image for the same z (noise disabled on both sides).

Runs on a synthetic random-init state dict of the published architecture
(`/root/reference/weights.md`), with the reference's own torch model
(imported from /root/reference as a test-only oracle, like tests/test_ada.py)
providing the ground-truth forward. With $ANIMEFACE_SG2_WEIGHTS pointing at
the real `StyleGAN2_animeface_128pix.pt`, the same assertion runs against the
published checkpoint and a golden grid is written next to it.
'''

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def _ref_model_module():
    spec = importlib.util.spec_from_file_location(
        'ref_sg2_model', '/root/reference/implementations/StyleGAN2/model.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _disable_noise(ref_g, ref_mod):
    for m in ref_g.modules():
        if isinstance(m, ref_mod.InjectNoise):
            m.forward = lambda x: x


def _torch_forward(ref_g, z_np):
    with torch.no_grad():
        img, _ = ref_g(torch.from_numpy(z_np))
        return img.numpy().transpose(0, 2, 3, 1)   # NCHW -> NHWC


def _flax_forward(params, z_np, **cfg):
    import jax.numpy as jnp
    from animeface_tpu.implementations.StyleGAN2.model import Generator
    G = Generator(fused_resample=False, **cfg)
    img, _ = G.apply({'params': params}, jnp.asarray(z_np))  # no noise rng
    return np.asarray(img)


CFG_SMALL = dict(image_size=32, style_dim=16, channels=8, max_channels=32,
                 block_num_conv=2, map_num_layers=2, map_lr=0.01)


def test_convert_generator_forward_parity():
    from tools.convert_stylegan2_weights import convert_generator

    ref_mod = _ref_model_module()
    torch.manual_seed(0)
    ref_g = ref_mod.Generator(**CFG_SMALL)
    # realistic weight scale (reference init_weight_N01)
    for p in ref_g.parameters():
        p.data.normal_(0, 1.0)
    ref_g.eval()
    _disable_noise(ref_g, ref_mod)

    z = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32)
    want = _torch_forward(ref_g, z)

    params = convert_generator(ref_g.state_dict())
    got = _flax_forward(params, z, **CFG_SMALL)

    assert got.shape == want.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_convert_generator_roundtrip_msgpack(tmp_path):
    '''The converted tree survives save_model/load_model and drives
    tools/generate.py-style inference.'''
    import jax.numpy as jnp
    from tools.convert_stylegan2_weights import convert_generator
    from animeface_tpu.checkpoint import save_model, load_model
    from animeface_tpu.implementations.StyleGAN2.model import Generator

    ref_mod = _ref_model_module()
    torch.manual_seed(1)
    ref_g = ref_mod.Generator(**CFG_SMALL)
    # reference uses torch.empty for some params: init before converting
    for p in ref_g.parameters():
        p.data.normal_(0, 1.0)
    params = convert_generator(ref_g.state_dict())

    path = str(tmp_path / 'G.msgpack')
    save_model(path, params)

    G = Generator(fused_resample=False, **CFG_SMALL)
    z0 = jnp.zeros((1, 16))
    template = G.init({'params': __import__('jax').random.PRNGKey(0)},
                      z0)['params']
    restored = load_model(path, template)
    img, _ = G.apply({'params': restored}, z0)
    assert img.shape == (1, 32, 32, 3)
    assert bool(np.isfinite(np.asarray(img)).all())


@pytest.mark.skipif(not os.environ.get('ANIMEFACE_SG2_WEIGHTS'),
                    reason='set ANIMEFACE_SG2_WEIGHTS to the published '
                           'StyleGAN2_animeface_128pix.pt')
def test_published_checkpoint_golden():
    '''With the real artifact available: exact forward parity at 128px and a
    committed-format golden grid from a fixed seed.'''
    from tools.convert_stylegan2_weights import convert_generator
    from animeface_tpu.utils import save_image

    path = os.environ['ANIMEFACE_SG2_WEIGHTS']
    sd = torch.load(path, map_location='cpu', weights_only=True)

    cfg = dict(image_size=128, style_dim=512, channels=32, max_channels=512,
               block_num_conv=2, map_num_layers=8, map_lr=0.01)
    ref_mod = _ref_model_module()
    ref_g = ref_mod.Generator(**cfg)
    ref_g.load_state_dict(sd)
    ref_g.eval()
    _disable_noise(ref_g, ref_mod)

    z = np.random.default_rng(20260816).normal(size=(16, 512)).astype(np.float32)
    want = _torch_forward(ref_g, z)
    got = _flax_forward(convert_generator(sd), z, **cfg)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    save_image(got, os.path.join(os.path.dirname(path),
                                 'golden_grid_flax.png'), nrow=4)


def test_golden_output_regression(tmp_path):
    '''Pin the converted-generator synthesis to a COMMITTED golden tensor
    (tests/data/sg2_golden.npz): fixed torch-seed weights, fixed z, noise
    off. Any change to the modulated-conv factorization, resampling, or the
    converter that alters output values fails this test — the synthetic-
    weights stand-in for the published-checkpoint golden grid.'''
    from tools.convert_stylegan2_weights import convert_generator

    ref_mod = _ref_model_module()
    torch.manual_seed(1234)
    ref_g = ref_mod.Generator(**CFG_SMALL)
    for p in ref_g.parameters():
        p.data.normal_(0, 1.0)
    ref_g.eval()
    _disable_noise(ref_g, ref_mod)

    params = convert_generator(ref_g.state_dict())
    z = np.random.default_rng(7).normal(
        size=(4, CFG_SMALL['style_dim'])).astype(np.float32)
    img = _flax_forward(params, z, **CFG_SMALL)

    golden_path = os.path.join(os.path.dirname(__file__), 'data',
                               'sg2_golden.npz')
    if not os.path.exists(golden_path):     # one-time generation, committed
        np.savez_compressed(golden_path, img=img.astype(np.float16))
        pytest.skip('golden generated — commit tests/data/sg2_golden.npz')
    golden = np.load(golden_path)['img'].astype(np.float32)
    np.testing.assert_allclose(img, golden, atol=2e-3)
