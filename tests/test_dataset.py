'''Data-layer tests: loader semantics, sharding, transforms, synthetic data,
factory fallback.'''

import numpy as np
import pytest
from PIL import Image as pilImage

from animeface_tpu.dataset import (
    DataLoader, cycle, to_loader, build_dataset, build_loader,
    SyntheticImage, SyntheticImageImage, SyntheticLRHR, SyntheticImageXDoG,
    SyntheticImageLabel, SyntheticImageOnehot,
)
from animeface_tpu.dataset._base import make_default_transform
from animeface_tpu.utils import EasyDict


def _args(**kw):
    base = dict(image_size=32, batch_size=4, dataset='animeface', min_year=2005,
                num_images=64, seed=0, data_root='/nonexistent',
                synthetic_data=True)
    base.update(kw)
    return EasyDict(base)


def test_synthetic_image_deterministic():
    d = SyntheticImage(32, num_images=8, seed=1)
    a, b = d[3], d[3]
    assert a.shape == (32, 32, 3)
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    assert a.min() >= -1.0 and a.max() <= 1.0
    assert not np.allclose(d[3], d[4])


def test_synthetic_variants_shapes():
    a, b = SyntheticImageImage(16, 4)[0]
    assert a.shape == (16, 16, 3) and b.shape == (16, 16, 3)
    lr, sr = SyntheticLRHR(16, 2, 4)[0]
    assert lr.shape == (8, 8, 3) and sr.shape == (16, 16, 3)
    img, xdog = SyntheticImageXDoG(16, 4)[0]
    assert xdog.shape == (16, 16, 1)
    img, label = SyntheticImageLabel(16, 4, num_classes=5)[0]
    assert 0 <= int(label) < 5
    img, onehot = SyntheticImageOnehot(16, 4, num_classes=5)[0]
    assert onehot.shape == (5,) and onehot.sum() == 1.0


def test_loader_batching_and_drop_last():
    d = SyntheticImage(16, num_images=10)
    loader = DataLoader(d, batch_size=4, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0].shape == (4, 16, 16, 3)
    assert len(loader) == 2


def test_loader_threaded_matches_sync():
    d = SyntheticImage(16, num_images=12)
    sync = list(DataLoader(d, 4, shuffle=False, num_workers=1))
    thr = list(DataLoader(d, 4, shuffle=False, num_workers=4))
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a, b)


def test_loader_sharding_disjoint():
    d = SyntheticImage(8, num_images=16)
    all_idx = []
    for shard in range(4):
        loader = DataLoader(d, 2, shuffle=True, seed=5, shard_count=4,
                            shard_index=shard, num_workers=1)
        idx = loader._epoch_indices()
        assert len(idx) == 4
        all_idx.extend(idx.tolist())
    assert sorted(all_idx) == list(range(16))  # full cover, no overlap


def test_loader_tuple_collate():
    d = SyntheticLRHR(16, 2, num_images=8)
    lr, sr = next(iter(DataLoader(d, 4, num_workers=1)))
    assert lr.shape == (4, 8, 8, 3) and sr.shape == (4, 16, 16, 3)


def test_cycle():
    d = SyntheticImage(8, num_images=4)
    loader = DataLoader(d, 2, num_workers=1)
    it = cycle(loader)
    shapes = [next(it).shape for _ in range(5)]  # crosses epoch boundary
    assert all(s == (2, 8, 8, 3) for s in shapes)


def test_make_default_transform():
    img = pilImage.new('RGB', (100, 60), (255, 0, 0))
    t = make_default_transform(32, hflip=False)
    out = t(img)
    assert out.shape == (32, 32, 3)
    assert np.isclose(out[..., 0].mean(), 1.0, atol=1e-2)   # red -> +1
    assert np.isclose(out[..., 1].mean(), -1.0, atol=1e-2)  # green -> -1
    t2 = make_default_transform(32, normalize=False, hflip=False)
    assert t2(img).max() <= 1.0 and t2(img).min() >= 0.0


def test_build_dataset_synthetic_fallback(recwarn):
    args = _args(synthetic_data=False, data_root='/definitely/missing')
    d = build_dataset(args, 'image')
    assert isinstance(d, SyntheticImage)
    assert any('synthetic' in str(w.message) for w in recwarn.list)


def test_build_dataset_all_tasks():
    args = _args()
    for task in ('image', 'celeba', 'sr', 'xdog', 'label', 'onehot'):
        d = build_dataset(args, task)
        assert len(d) > 0
        _ = d[0]


def test_build_loader():
    loader = build_loader(_args(), 'image')
    batch = next(iter(loader))
    assert batch.shape == (4, 32, 32, 3)


def test_to_loader_and_asloader():
    d = SyntheticImage(8, num_images=8)
    batch = next(iter(to_loader(d, 2, num_workers=1)))
    assert batch.shape == (2, 8, 8, 3)
    loader = SyntheticImage.asloader(2, (8,), dict(num_images=8), num_workers=1)
    assert next(iter(loader)).shape == (2, 8, 8, 3)


def test_unknown_dataset_raises():
    args = _args(dataset='nope', synthetic_data=False, data_root='/tmp')
    with pytest.raises(KeyError):
        build_dataset(args, 'image')


def test_device_data_loader_matches_streaming():
    '''DeviceDataLoader (device-resident uint8 + on-device decode) yields the
    same epoch batches as the streaming DataLoader, within the uint8
    quantization a decoded 8-bit dataset has anyway.'''
    import jax.numpy as jnp
    from animeface_tpu.dataset.device import DeviceDataLoader

    ds = SyntheticImage(16, num_images=12, seed=3)
    host = DataLoader(ds, 4, seed=7, num_workers=1)
    dev = DeviceDataLoader(ds, 4, seed=7)
    assert len(host) == len(dev) == 3
    for hb, db in zip(host, dev):
        db = np.asarray(db)
        assert db.dtype == np.float32
        assert np.abs(hb - db).max() <= (1.0 / 127.5) * 0.51
    # second epoch reshuffles
    first = [np.asarray(b) for b in dev]
    second = [np.asarray(b) for b in dev]
    assert not all(np.array_equal(a, b) for a, b in zip(first, second))


def test_device_data_loader_tuple_and_labels():
    from animeface_tpu.dataset.device import DeviceDataLoader

    ds = SyntheticImageLabel(16, num_images=8, num_classes=3)
    host = DataLoader(ds, 4, seed=0, num_workers=1)
    dev = DeviceDataLoader(ds, 4, seed=0)
    hb = next(iter(host))
    db = next(iter(dev))
    assert isinstance(db, tuple) and len(db) == len(hb)
    img_h, lab_h = hb[0], hb[1]
    img_d, lab_d = np.asarray(db[0]), np.asarray(db[1])
    assert np.abs(img_h - img_d).max() <= (1.0 / 127.5) * 0.51
    np.testing.assert_array_equal(np.asarray(lab_h), lab_d)


def test_device_data_loader_size_cap():
    from animeface_tpu.dataset.device import DeviceDataLoader

    ds = SyntheticImage(32, num_images=8)
    with pytest.raises(ValueError, match='too large'):
        DeviceDataLoader(ds, 4, max_bytes=1024)


def test_build_loader_device_data_flag():
    from animeface_tpu.dataset.device import DeviceDataLoader

    loader = build_loader(_args(num_images=8, device_data=True), 'image')
    assert isinstance(loader, DeviceDataLoader)
    b = np.asarray(next(iter(loader)))
    assert b.shape == (4, 32, 32, 3)
