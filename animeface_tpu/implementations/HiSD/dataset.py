'''HiSD dataset (reference `implementations/HiSD/dataset.py`): per-(category,
tag) image pools built from the color_label csv (hair/eye/glass), each with
its own infinite loader; `Category.sample(j)` draws a batch of tag j.
Synthetic fallback: per-tag procedural pools with distinct seeds.'''

from __future__ import annotations

import csv
import os

from animeface_tpu.dataset import DataLoader, cycle, make_default_transform
from animeface_tpu.dataset._base import Image, data_path
from animeface_tpu.dataset.synthetic import SyntheticImage


class Tag(Image):
    def __init__(self, image_paths, image_size, resize_ratio=1.0):
        self._paths = image_paths
        super().__init__(make_default_transform(image_size, resize_ratio))

    def _load(self):
        return self._paths


def _split_to_tags(label_file):
    with open(label_file, encoding='utf-8') as fin:
        rows = list(csv.reader(fin))
    unique = sorted({r[1] for r in rows})
    pools = [[r[0] for r in rows if r[1] == u] for u in unique]
    return pools, unique


class Category:
    '''Per-tag loaders with infinite cycling (reference Category :38).'''

    def __init__(self, datasets, batch_size, seed=0):
        self.loaders = [DataLoader(d, batch_size, seed=seed)
                        for d in datasets]
        self.iters = [cycle(l) for l in self.loaders]
        self.num_tags = len(datasets)
        self.length = sum(len(d) for d in datasets)

    def sample(self, j):
        return next(self.iters[j])


def make_categories(args, names=('hair', 'eye', 'glass'),
                    synthetic_tags=(3, 3, 2)):
    '''Category objects from color_label csvs, or synthetic per-tag pools.'''
    categories = []
    use_synth = getattr(args, 'synthetic_data', False) or \
        not os.path.isdir(getattr(args, 'data_root', '') or '/nonexistent')
    for ci, name in enumerate(names):
        label_file = data_path('animefacedataset', f'{name}_label.csv')
        if not use_synth and os.path.exists(label_file):
            pools, _ = _split_to_tags(label_file)
            datasets = [Tag(p, args.image_size) for p in pools]
        else:
            n = synthetic_tags[ci]
            count = min(getattr(args, 'num_images', None) or 512, 2048) // n
            datasets = [SyntheticImage(args.image_size, count,
                                       seed=args.seed + ci * 100 + t)
                        for t in range(n)]
        categories.append(Category(datasets, args.batch_size,
                                   seed=args.seed + ci))
    return categories
