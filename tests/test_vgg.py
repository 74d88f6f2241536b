'''VGG perceptual-loss weight path: converter + loader + forward parity
against a torch oracle (reference `nnutils/loss/vgg.py:15-69` uses pretrained
torchvision VGG; torch here is a test-only oracle, like tests/test_ada.py).

The parity test runs on a synthetic torchvision-layout state dict, so it
validates the full artifact contract (tools/convert_vgg_weights.py ->
ANIMEFACE_VGG_WEIGHTS .npz -> flax forward) without needing the real
ImageNet weights, which this zero-egress image cannot download. With
$ANIMEFACE_VGG_WEIGHTS set to a real artifact the same assertions run
against it.
'''

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# torchvision vgg16 conv indices inside `features` (layout the converter sees)
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG16_SHAPES = [
    (64, 3), (64, 64),
    (128, 64), (128, 128),
    (256, 128), (256, 256), (256, 256),
    (512, 256), (512, 512), (512, 512),
    (512, 512), (512, 512), (512, 512),
]


def _synthetic_vgg16_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for idx, (co, ci) in zip(_VGG16_CONV_IDX, _VGG16_SHAPES):
        # small std keeps 13 stacked convs numerically tame for the oracle
        sd[f'features.{idx}.weight'] = torch.randn((co, ci, 3, 3), generator=g) * 0.05
        sd[f'features.{idx}.bias'] = torch.randn((co,), generator=g) * 0.05
    return sd


def _torch_vgg16_features(sd, x_nchw):
    '''Oracle: VGG16 feature trunk forward returning the 5 post-relu slices
    (same cut points as the reference VGG :15).'''
    import torch.nn.functional as F
    feats = []
    it = iter(_VGG16_CONV_IDX)
    x = x_nchw
    for block, n_convs in enumerate((2, 2, 3, 3, 3)):
        for _ in range(n_convs):
            i = next(it)
            x = F.conv2d(x, sd[f'features.{i}.weight'],
                         sd[f'features.{i}.bias'], padding=1)
            x = F.relu(x)
        feats.append(x)
        if block < 4:
            x = F.max_pool2d(x, 2, 2)
    return feats


def test_vgg_converter_npz_forward_parity(tmp_path):
    from tools.convert_vgg_weights import convert
    from animeface_tpu.nnutils.loss.vgg import VGGLoss

    sd = _synthetic_vgg16_state_dict()
    npz_path = tmp_path / 'vgg16.npz'
    np.savez(npz_path, **convert(sd))

    loss = VGGLoss(vgg=16, weights_path=str(npz_path))
    assert loss.provenance.startswith('pretrained:')

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)

    flax_feats = loss._features(img)

    # oracle applies the same [-1,1] -> [0,1] -> imagenet normalization
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.from_numpy(img.transpose(0, 3, 1, 2))
    x = ((x * 0.5 + 0.5) - mean) / std
    torch_feats = _torch_vgg16_features(sd, x)

    assert len(flax_feats) == 5
    for i, (f, t) in enumerate(zip(flax_feats, torch_feats)):
        t = t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(f), t, atol=1e-3, rtol=2e-3,
                                   err_msg=f'block {i}')


def test_vgg_npz_matches_pth_loader(tmp_path):
    '''The .npz artifact and the raw .pth deserializer load identical params.'''
    from tools.convert_vgg_weights import convert
    from animeface_tpu.nnutils.loss.vgg import (
        _load_npz_weights, _load_torch_weights)

    sd = _synthetic_vgg16_state_dict(seed=1)
    npz_path, pth_path = tmp_path / 'w.npz', tmp_path / 'w.pth'
    np.savez(npz_path, **convert(sd))
    torch.save(sd, pth_path)

    a = _load_npz_weights(str(npz_path), 16)
    b = _load_torch_weights(str(pth_path), 16)
    import jax
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_vgg_npz_wrong_depth_raises(tmp_path):
    from tools.convert_vgg_weights import convert
    from animeface_tpu.nnutils.loss.vgg import _load_npz_weights

    npz_path = tmp_path / 'w.npz'
    np.savez(npz_path, **convert(_synthetic_vgg16_state_dict()))
    with pytest.raises(ValueError, match='VGG16'):
        _load_npz_weights(str(npz_path), 19)


def test_vgg_random_fallback_is_loud(capsys):
    from animeface_tpu.nnutils.loss import vgg as vgg_mod
    from animeface_tpu.nnutils.loss.vgg import VGGLoss
    import warnings
    # the provenance line prints once per process (per-eval construction
    # must not spam stderr) — reset so this test observes it even when an
    # earlier test already constructed a random-init VGG
    vgg_mod._ANNOUNCED.clear()
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        loss = VGGLoss(vgg=16, weights_path=None)
    assert 'RANDOM-INIT' in loss.provenance
    err = capsys.readouterr().err
    assert 'RANDOM-INIT' in err and 'convert_vgg_weights' in err


@pytest.mark.skipif(not os.environ.get('ANIMEFACE_VGG_WEIGHTS'),
                    reason='set ANIMEFACE_VGG_WEIGHTS to a converted artifact')
def test_vgg_real_weights_load():
    from animeface_tpu.nnutils.loss.vgg import VGGLoss
    loss = VGGLoss(vgg=16)
    assert loss.provenance.startswith('pretrained:')
