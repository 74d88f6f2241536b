'''Host input-pipeline benchmark: can the host feed the chip?

SURVEY §7 flags 256px host decode as a hard part; the chip consumes
~267 img/s (bench.py), so the loader must sustain more than that.
Generates synthetic JPEGs (typical dataset sizes), then measures steady-
state DataLoader throughput for:
  * the native C++ decode path (native/animeface_io.cpp via ctypes),
  * the PIL fallback path,
  * the pair-dataset path (two aligned images per sample).

Usage: python scripts/loader_bench.py [n_images] [batch] [image_size]
Prints one line per configuration; appends nothing — copy results into
PERF_NOTES.md.
'''

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image as pilImage

from animeface_tpu.dataset._base import (
    DataLoader, Image, ImageImage, make_default_transform)


def make_dataset_files(root, n, src_size):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 256, size=(src_size, src_size, 3),
                           dtype=np.uint8)
        p = os.path.join(root, f'{i:05d}.jpg')
        pilImage.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


class SyntheticImage(Image):
    paths: list = []

    def _load(self):
        return list(self.paths)


class SyntheticPair(ImageImage):
    paths: list = []

    def _load(self):
        return list(self.paths), list(self.paths)


def run(loader, warm_batches=4, batches=24):
    it = iter(loader)

    def nxt():
        nonlocal it
        try:
            return next(it)
        except StopIteration:           # loop epochs like training does
            it = iter(loader)
            return next(it)

    for _ in range(warm_batches):
        nxt()
    t0 = time.perf_counter()
    n = 0
    for _ in range(batches):
        b = nxt()
        n += (b[0] if isinstance(b, (tuple, list)) else b).shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    with tempfile.TemporaryDirectory() as root:
        print(f'writing {n_images} synthetic {int(size * 1.2)}px jpegs ...',
              flush=True)
        paths = make_dataset_files(root, n_images, int(size * 1.2))
        tf = make_default_transform(size, resize_scale=1.0)

        for workers in (4, 8, 16):
            SyntheticImage.paths = paths
            ds = SyntheticImage(tf)
            assert ds.native_ok(), 'native decode lib not available'
            loader = DataLoader(ds, batch, num_workers=workers)
            print(f'native  decode, {workers:2d} workers: '
                  f'{run(loader):8.1f} img/s', flush=True)

        # PIL fallback (disable the native batch route)
        SyntheticImage.paths = paths
        ds = SyntheticImage(tf)
        ds.native_ok = lambda: False
        loader = DataLoader(ds, batch, num_workers=8)
        print(f'PIL     decode,  8 workers: {run(loader):8.1f} img/s',
              flush=True)

        SyntheticPair.paths = paths
        dsp = SyntheticPair(tf)
        loader = DataLoader(dsp, batch, num_workers=8)
        print(f'pair    decode,  8 workers: {run(loader):8.1f} pairs/s',
              flush=True)


if __name__ == '__main__':
    main()
