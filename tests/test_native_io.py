'''Native C++ IO pipeline (native/animeface_io.cpp via dataset/native.py):
parity with the PIL transform path and failure handling.'''

import os

import numpy as np
import pytest
from PIL import Image as pilImage

from animeface_tpu.dataset import native
from animeface_tpu.dataset._base import make_default_transform

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native lib not built')


def _write_images(tmp_path, h=48, w=48):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    jpg = str(tmp_path / 'a.jpg')
    png = str(tmp_path / 'b.png')
    pilImage.fromarray(arr).save(jpg, quality=95)
    pilImage.fromarray(arr).save(png)
    return jpg, png, arr


def test_png_exact_no_resize(tmp_path):
    _, png, arr = _write_images(tmp_path)
    out = native.load_image(png, 48, resize_scale=1.)
    assert out is not None and out.shape == (48, 48, 3)
    ref = arr.astype(np.float32) / 255. * 2. - 1.
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_jpeg_close_to_pil(tmp_path):
    jpg, _, _ = _write_images(tmp_path)
    out = native.load_image(jpg, 48, resize_scale=1.)
    pil = np.asarray(pilImage.open(jpg).convert('RGB'), np.float32)
    ref = pil / 255. * 2. - 1.
    # libjpeg IDCT may differ from PIL's by a few LSBs
    assert np.abs(out - ref).max() < 0.1
    assert np.abs(out - ref).mean() < 0.01


def test_hflip(tmp_path):
    _, png, arr = _write_images(tmp_path)
    out = native.load_image(png, 48, resize_scale=1., hflip=True)
    ref = (arr.astype(np.float32) / 255. * 2. - 1.)[:, ::-1]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_crop_matches_pil(tmp_path):
    # Non-square source: shorter-edge resize + center crop. The native
    # triangle-filter resample replicates PIL BILINEAR to quantization error.
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(96, 64, 3), dtype=np.uint8)
    png = str(tmp_path / 'c.png')
    pilImage.fromarray(arr).save(png)
    out = native.load_image(png, 32, resize_scale=1.)
    t = make_default_transform(32, 1., hflip=False)
    ref = t(pilImage.open(png).convert('RGB'))
    assert out.shape == ref.shape == (32, 32, 3)
    np.testing.assert_allclose(out, ref, atol=2.5 / 255.)


def test_upscale_matches_pil_closely(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    png = str(tmp_path / 'd.png')
    pilImage.fromarray(arr).save(png)
    out = native.load_image(png, 32, resize_scale=1.)
    t = make_default_transform(32, 1., hflip=False)
    ref = t(pilImage.open(png).convert('RGB'))
    # On upscale both are plain bilinear -> should agree tightly.
    assert np.abs(out - ref).mean() < 0.02


def test_batch_and_failure(tmp_path):
    jpg, png, _ = _write_images(tmp_path)
    bad = str(tmp_path / 'broken.jpg')
    with open(bad, 'wb') as f:
        f.write(b'\xff\xd8not an image')
    batch, fail = native.load_batch([jpg, png, bad], 24, 1.,
                                    hflip_mask=[0, 1, 0])
    assert batch.shape == (3, 24, 24, 3)
    assert fail.tolist() == [0, 0, 1]
    assert np.all(batch[2] == 0)
    assert batch[:2].min() >= -1.001 and batch[:2].max() <= 1.001


def test_dataset_integration(tmp_path):
    '''DataLoader routes through load_native_batch for path-backed datasets.'''
    from animeface_tpu.dataset._base import Image as ImageBase, DataLoader

    paths = []
    rng = np.random.default_rng(3)
    for i in range(8):
        arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        p = str(tmp_path / f'{i}.png')
        pilImage.fromarray(arr).save(p)
        paths.append(p)

    class DS(ImageBase):
        def _load(self):
            return paths

    ds = DS(make_default_transform(32, 1., hflip=False))
    assert ds.native_ok()
    batch = ds.load_native_batch(np.arange(8))
    assert batch.shape == (8, 32, 32, 3)
    loader = DataLoader(ds, batch_size=4, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2 and batches[0].shape == (4, 32, 32, 3)


def test_pair_dataset_native(tmp_path):
    '''ImageXDoG/ImageImage route through the native decoder.'''
    from animeface_tpu.dataset._base import (
        ImageXDoG, ImageImage, make_default_transform, DataLoader,
    )
    rng = np.random.default_rng(7)
    imgs, lines = [], []
    for i in range(8):
        arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        g = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
        p1 = str(tmp_path / f'i{i}.png')
        p2 = str(tmp_path / f'x{i}.png')
        pilImage.fromarray(arr).save(p1)
        pilImage.fromarray(g, mode='L').save(p2)
        imgs.append(p1)
        lines.append(p2)

    class XD(ImageXDoG):
        def _load(self):
            return imgs, lines

    ds = XD(make_default_transform(32, 1., hflip=False))
    assert ds.native_ok()
    a, b = ds.load_native_batch(np.arange(8))
    assert a.shape == (8, 32, 32, 3) and b.shape == (8, 32, 32, 1)
    # grayscale parity with the PIL path
    ref_img, ref_line = ds[0]
    np.testing.assert_allclose(a[0], ref_img, atol=2.5 / 255)
    np.testing.assert_allclose(b[0], ref_line, atol=2.5 / 255)
    batches = list(DataLoader(ds, 4, shuffle=False, num_workers=1))
    assert batches[0][0].shape == (4, 32, 32, 3)
    assert batches[0][1].shape == (4, 32, 32, 1)

    class II(ImageImage):
        def _load(self):
            return imgs, imgs[::-1]

    ds2 = II(make_default_transform(32, 1., hflip=False))
    assert ds2.native_ok()
    x, y = ds2.load_native_batch(np.arange(4))
    assert x.shape == y.shape == (4, 32, 32, 3)
