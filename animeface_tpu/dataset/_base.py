'''Dataset base classes.

API parity with reference `dataset/_base.py` (`make_default_transform` :18,
`WrappedDataset.asloader` :46, task-shaped bases Image :59 / ImageImage :79 /
LRHR :102 / ImageXDoG :146 / ImageLabel :173 / ImageOnehot :212), TPU-adapted:
  * batches are numpy float32 NHWC in [-1, 1] (ready for jnp.asarray / bf16 cast)
  * the loader is a lightweight threaded decode pipeline (no torch DataLoader
    workers); `asloader` keeps its signature
  * `shard_count`/`shard_index` on the loader implement per-host sharding (the
    role of the reference's dormant InfiniteSampler, stylegan2_ops/misc.py:106)
  * the data root is configurable (reference hard-codes /usr/src/data)
'''

from __future__ import annotations

import os
import random as _random
import threading
import queue as _queue
from collections.abc import Callable

import numpy as np
from PIL import Image as pilImage, ImageFile
from sklearn.preprocessing import LabelEncoder, OneHotEncoder

ImageFile.LOAD_TRUNCATED_IMAGES = True

DATA_ROOT = os.environ.get('ANIMEFACE_DATA_ROOT', '/usr/src/data')


def set_data_root(root: str) -> None:
    global DATA_ROOT
    DATA_ROOT = root


def data_path(*parts) -> str:
    return os.path.join(DATA_ROOT, *parts)


# ---------------- transforms (PIL -> numpy HWC float32) ----------------

def _resize(img: pilImage.Image, size: int) -> pilImage.Image:
    '''torchvision T.Resize semantics: `size` is the SHORTER edge.'''
    w, h = img.size
    if w <= h:
        nw, nh = size, max(1, round(h * size / w))
    else:
        nw, nh = max(1, round(w * size / h)), size
    return img.resize((nw, nh), pilImage.BILINEAR)


def _center_crop(img: pilImage.Image, size: int) -> pilImage.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def _to_array(img: pilImage.Image, normalize: bool = True) -> np.ndarray:
    a = np.asarray(img, dtype=np.float32) / 255.0
    if a.ndim == 2:
        a = a[..., None]
    if normalize:
        a = a * 2.0 - 1.0
    return a


def make_default_transform(image_size: int, resize_scale: float = 1.,
                           hflip: bool = True, normalize: bool = True) -> Callable:
    '''Resize(shorter=size*scale) -> CenterCrop -> [RandomHFlip] -> [-1,1] HWC.'''

    def transform(img: pilImage.Image) -> np.ndarray:
        img = _resize(img, int(image_size * resize_scale))
        img = _center_crop(img, image_size)
        a = _to_array(img, normalize)
        if hflip and _random.random() > 0.5:
            a = a[:, ::-1].copy()
        return a

    # Tag the pipeline parameters so datasets can route through the native
    # C++ decode path (dataset/native.py) when it computes the same thing.
    transform.native_cfg = dict(image_size=image_size,
                                resize_scale=resize_scale,
                                hflip=hflip) if normalize else None
    return transform


# ---------------- loader ----------------

def _default_collate(samples):
    if isinstance(samples[0], (tuple, list)):
        return tuple(_default_collate([s[i] for s in samples])
                     for i in range(len(samples[0])))
    return np.stack(samples, axis=0)


def _quantize_images(batch):
    '''[-1,1] float image batches -> uint8 [0,255] for the wire (the exact
    inverse of parallel.mesh.dequantize_images). Non-image leaves (labels,
    vectors) pass through untouched.'''
    if isinstance(batch, (tuple, list)):
        return tuple(_quantize_images(b) for b in batch)
    if batch.ndim == 4 and batch.dtype == np.float32:
        return np.clip(np.rint((batch + 1.0) * 127.5),
                       0, 255).astype(np.uint8)
    return batch


class DataLoader:
    '''Minimal epoch-based loader yielding numpy NHWC batches.

    Iterates the dataset in shuffled order, decoding samples on `num_workers`
    threads with a bounded prefetch queue. `shard_count`/`shard_index`
    partition each epoch's permutation across hosts (same seed everywhere ->
    disjoint shards, InfiniteSampler semantics).
    '''

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int | None = None,
                 seed: int = 0, shard_count: int | None = None,
                 shard_index: int = 0, prefetch: int = 4,
                 transfer_dtype: str = 'float32'):
        assert batch_size >= 1
        assert transfer_dtype in ('float32', 'uint8'), transfer_dtype
        if shard_count is None:
            # multi-host default: shard epochs across processes and split the
            # GLOBAL --batch-size into per-process slices (shard_batch then
            # assembles the global array from them). Single-process runs hit
            # the degenerate (1, 0) path with batch_size unchanged.
            from animeface_tpu.parallel.multihost import (
                process_shard, local_batch_size)
            shard_count, shard_index = process_shard()
            batch_size = local_batch_size(batch_size)
        assert 0 <= shard_index < shard_count
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers if num_workers is not None
                               else (os.cpu_count() or 1))
        self.seed = seed
        self.shard_count = shard_count
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.transfer_dtype = transfer_dtype
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.shard_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        return idx[self.shard_index::self.shard_count]

    def __iter__(self):
        idx = self._epoch_indices()
        self._epoch += 1
        nb = len(idx) // self.batch_size if self.drop_last else \
            (len(idx) + self.batch_size - 1) // self.batch_size

        # Native C++ fast path: the dataset decodes whole batches on its own
        # thread pool, so a single producer thread suffices either way.
        batch_fn = getattr(self.dataset, 'load_native_batch', None)
        if batch_fn is not None and not self.dataset.native_ok():
            batch_fn = None
        if batch_fn is None:
            def batch_fn(chunk):
                return _default_collate([self.dataset[int(i)] for i in chunk])

        if self.transfer_dtype == 'uint8':
            # Host->device transfer compression: image batches leave the
            # loader as uint8 [0,255] (4x fewer bytes over PCIe / the axon
            # tunnel); prefetch_to_device dequantizes back to the [-1,1]
            # float convention ON DEVICE. Numerically this matches the
            # reference's own pipeline, which is uint8 until ToTensor
            # (reference dataset/_base.py:18 Resize->ToTensor->Normalize).
            inner_fn = batch_fn

            def batch_fn(chunk):
                return _quantize_images(inner_fn(chunk))

        if self.num_workers <= 1:
            for b in range(nb):
                chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                yield batch_fn(chunk)
            return

        out_q: _queue.Queue = _queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        break
                    chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    out_q.put(batch_fn(chunk))
                out_q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class WrappedDataset:
    '''Base dataset with the reference's `asloader` factory (dataset/_base.py:46).'''

    def _load(self):
        raise NotImplementedError()

    def __len__(self) -> int:
        raise NotImplementedError()

    @classmethod
    def asloader(cls, batch_size: int, cls_args: tuple = (), cls_kwargs: dict = {},
                 shuffle: bool = True, num_workers: int | None = None,
                 pin_memory: bool = False, **loader_kwargs) -> DataLoader:
        # pin_memory accepted for API parity; meaningless for TPU transfers
        dataset = cls(*cls_args, **cls_kwargs)
        return DataLoader(dataset, batch_size, shuffle=shuffle, drop_last=True,
                          num_workers=num_workers, **loader_kwargs)


class Image(WrappedDataset):
    '''Single-image datasets.'''

    def __init__(self, transform: Callable) -> None:
        self.images = self._load()
        self.transform = transform

    def __getitem__(self, index) -> np.ndarray:
        image = pilImage.open(self.images[index]).convert('RGB')
        return self.transform(image)

    # ---- native C++ decode path (dataset/native.py) ----

    def native_ok(self) -> bool:
        return _native_cfg_ok(self.transform, self.images)

    def load_native_batch(self, indices) -> np.ndarray:
        return _native_decode(self.images, indices, self.transform.native_cfg,
                              lambda i: self[i])

    def __len__(self) -> int:
        return len(self.images)


def _native_cfg_ok(transform, paths) -> bool:
    from animeface_tpu.dataset import native
    cfg = getattr(transform, 'native_cfg', None)
    return cfg is not None and native.available() and len(paths) > 0 \
        and isinstance(paths[0], (str, os.PathLike))


def _native_decode(paths, indices, cfg, fallback):
    '''Batch-decode `paths[indices]` through the C++ pipeline; corrupt files
    fall back to the per-sample PIL path via `fallback(i)`.'''
    from animeface_tpu.dataset import native
    sel = [str(paths[int(i)]) for i in indices]
    mask = (np.random.rand(len(sel)) > 0.5).astype(np.uint8) \
        if cfg['hflip'] else None
    batch, fail = native.load_batch(sel, cfg['image_size'],
                                    cfg['resize_scale'], mask)
    for i in np.nonzero(fail)[0]:
        batch[i] = fallback(int(indices[int(i)]))
    return batch


class ImageImage(WrappedDataset):
    '''Two-domain datasets for unpaired I2I.'''

    def __init__(self, transform: Callable) -> None:
        self.images1, self.images2 = self._load()
        self.transform = transform

    def __getitem__(self, index):
        image1 = pilImage.open(self.images1[index]).convert('RGB')
        image2 = pilImage.open(self.images2[index]).convert('RGB')
        return self.transform(image1), self.transform(image2)

    def native_ok(self) -> bool:
        return _native_cfg_ok(self.transform, self.images1) \
            and _native_cfg_ok(self.transform, self.images2)

    def load_native_batch(self, indices):
        cfg = self.transform.native_cfg
        a = _native_decode(
            self.images1, indices, cfg,
            lambda i: self.transform(
                pilImage.open(self.images1[i]).convert('RGB')))
        b = _native_decode(
            self.images2, indices, cfg,
            lambda i: self.transform(
                pilImage.open(self.images2[i]).convert('RGB')))
        return a, b

    def __len__(self) -> int:
        return len(self.images1)


class LRHR(WrappedDataset):
    '''Paired low-res / high-res dataset for SR (shared random hflip).'''

    def __init__(self, image_size: int, scale: float = 2.,
                 resize_scale: float = 1.) -> None:
        self.images = self._load()
        self.image_size = image_size
        self.resize_scale = resize_scale
        self.scale = scale

    def __getitem__(self, index):
        image = pilImage.open(self.images[index]).convert('RGB')
        return self.transform(image)

    def transform(self, img):
        return self._default_transform(img)

    def _default_transform(self, img):
        lr_size = int(self.image_size // self.scale)
        sr = _center_crop(_resize(img, int(self.image_size * self.resize_scale)),
                          self.image_size)
        lr = _center_crop(_resize(img, int(lr_size * self.resize_scale)), lr_size)
        sr = _to_array(sr)
        lr = _to_array(lr)
        if _random.random() > 0.5:
            sr = sr[:, ::-1].copy()
            lr = lr[:, ::-1].copy()
        return lr, sr

    def __len__(self) -> int:
        return len(self.images)


class ImageXDoG(WrappedDataset):
    '''Image + XDoG line-art pairs (sketch colorization).'''

    def __init__(self, transform: Callable) -> None:
        self.images, self.xdogs = self._load()
        self.transform = transform

    def __getitem__(self, index):
        image = pilImage.open(self.images[index]).convert('RGB')
        xdog = pilImage.open(self.xdogs[index]).convert('L')
        return self.transform(image), self.transform(xdog)

    def native_ok(self) -> bool:
        return _native_cfg_ok(self.transform, self.images) \
            and _native_cfg_ok(self.transform, self.xdogs)

    def load_native_batch(self, indices):
        cfg = self.transform.native_cfg
        imgs = _native_decode(
            self.images, indices, cfg,
            lambda i: self.transform(
                pilImage.open(self.images[i]).convert('RGB')))
        # xdog sources are grayscale (r==g==b after decode) -> keep 1 channel
        lines = _native_decode(
            self.xdogs, indices, cfg,
            lambda i: np.repeat(self.transform(
                pilImage.open(self.xdogs[i]).convert('L')), 3, axis=-1))
        return imgs, lines[..., :1]

    def shuffle_xdog(self) -> None:
        _random.shuffle(self.xdogs)

    def __len__(self) -> int:
        return len(self.images)


class ImageGray(WrappedDataset):
    '''RGB + on-the-fly grayscale pairs (reference
    `implementations/original/EDCNN/dataset.py:14` _ImageGrayOTF): gray is
    the ITU-R 601 luminance of the un-jittered crop; the rgb target gets a
    random hue shift of +-0.1 turns (TF.adjust_hue((rand-0.5)/5)).'''

    _LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)

    def __init__(self, transform: Callable) -> None:
        self.images = self._load()
        self.transform = transform

    def __getitem__(self, index):
        image = pilImage.open(self.images[index]).convert('RGB')
        gray = (self.transform(image) @ self._LUMA)[..., None]
        rgb = self.transform(self._jitter_hue(image))
        return rgb, gray.astype(np.float32)

    @staticmethod
    def _jitter_hue(img: pilImage.Image) -> pilImage.Image:
        delta = (_random.random() - 0.5) / 5            # turns in [-0.1, 0.1]
        h, s, v = img.convert('HSV').split()
        h = h.point(lambda p: (p + int(round(delta * 255))) % 256)
        return pilImage.merge('HSV', (h, s, v)).convert('RGB')

    def __len__(self) -> int:
        return len(self.images)


class ImageLabel(WrappedDataset):
    '''Image + integer label (sklearn LabelEncoder).'''

    def __init__(self, transform: Callable) -> None:
        self.images, labels = self._load()
        self.transform = transform
        self._make_label(labels)

    def _make_label(self, labels) -> None:
        self.encoder = LabelEncoder()
        labels = np.array(labels).reshape(-1)
        self.labels = self.encoder.fit_transform(labels)
        self.num_classes = len(self.encoder.classes_)

    def __getitem__(self, index):
        image = pilImage.open(self.images[index]).convert('RGB')
        return self.transform(image), np.int32(self.labels[index])

    def inverse_transform(self, label):
        label = np.asarray(label).reshape(-1)
        return self.encoder.inverse_transform(label)

    def __len__(self) -> int:
        return len(self.images)


class ImageOnehot(ImageLabel):
    '''Image + one-hot label (sklearn OneHotEncoder).'''

    def _make_label(self, labels) -> None:
        self.encoder = OneHotEncoder()
        labels = np.array(labels).reshape(-1, 1)
        self.labels = self.encoder.fit_transform(labels).toarray().astype(np.float32)
        self.num_classes = len(self.encoder.categories_[0])

    def __getitem__(self, index):
        image = pilImage.open(self.images[index]).convert('RGB')
        return self.transform(image), self.labels[index]

    def inverse_transform(self, label):
        label = np.asarray(label).reshape(1, -1)
        return self.encoder.inverse_transform(label)
