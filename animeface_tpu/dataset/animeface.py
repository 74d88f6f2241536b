'''AnimeFace dataset family (reference `dataset/animeface.py`).

Paths are relative to the configurable DATA_ROOT (reference hard-codes
/usr/src/data, animeface.py:34).
'''

from __future__ import annotations

import csv
import glob
import os
from collections.abc import Callable
from typing import Optional

from animeface_tpu.dataset._base import (
    Image, ImageImage, ImageXDoG, ImageGray, ImageLabel, ImageOnehot, LRHR,
    make_default_transform, data_path,
)

# strip posted year from filename `..._<year>.png` (reference animeface.py:17)
def _year_from_path(path: str) -> int:
    try:
        return int(os.path.splitext(os.path.basename(path))[0].split('_')[-1])
    except ValueError:
        return 0


def _animeface_images() -> list[str]:
    return sorted(glob.glob(data_path('animefacedataset', 'images', '*')))


def _celeba_images() -> list[str]:
    return sorted(glob.glob(data_path('celeba', 'img_align_celeba', '*')))


class AnimeFace(Image):
    '''63.6k anime face crops, filterable by posted year.'''

    def __init__(self, image_size: int, min_year: Optional[int] = 2005,
                 transform: Optional[Callable] = None) -> None:
        self.min_year = min_year
        if transform is None:
            transform = make_default_transform(image_size)
        super().__init__(transform)

    def _load(self) -> list[str]:
        images = _animeface_images()
        if self.min_year is not None:
            images = [p for p in images if _year_from_path(p) >= self.min_year]
        return images


class AnimeFaceCelebA(ImageImage):
    '''AnimeFace + CelebA for unpaired I2I.'''

    def __init__(self, image_size: int, min_year: Optional[int] = 2005,
                 transform: Optional[Callable] = None) -> None:
        self.min_year = min_year
        if transform is None:
            transform = make_default_transform(image_size)
        super().__init__(transform)

    def _load(self):
        images = _animeface_images()
        celeba = _celeba_images()
        if self.min_year is not None:
            images = [p for p in images if _year_from_path(p) >= self.min_year]
        length = min(len(images), len(celeba))
        return images[:length], celeba[:length]


class AnimeFaceSR(LRHR):
    def __init__(self, image_size: int, scale: float = 2,
                 transform: Optional[Callable] = None) -> None:
        if image_size > 128:
            import warnings
            warnings.warn('animeface images are small; use danbooru for SR')
        super().__init__(image_size, scale)
        if callable(transform):
            self.transform = transform

    def _load(self) -> list[str]:
        return _animeface_images()


class AnimeFaceGray(ImageGray):
    '''rgb + on-the-fly gray (reference original/EDCNN/dataset.py:41).'''

    def __init__(self, image_size: int,
                 transform: Optional[Callable] = None) -> None:
        if transform is None:
            transform = make_default_transform(image_size, hflip=False)
        super().__init__(transform)

    def _load(self):
        return _animeface_images()


class AnimeFaceXDoG(ImageXDoG):
    def __init__(self, image_size: int, min_year: Optional[int] = 2005,
                 transform: Optional[Callable] = None) -> None:
        self.min_year = min_year
        if transform is None:
            transform = make_default_transform(image_size, hflip=False)
        super().__init__(transform)

    def _load(self):
        images = _animeface_images()
        if self.min_year is not None:
            images = [p for p in images if _year_from_path(p) >= self.min_year]
        xdogs = [p.replace('images', 'xdog') for p in images]
        return images, xdogs


def _read_labels_csv() -> tuple[list[str], list[str]]:
    with open(data_path('animefacedataset', 'labels.csv'), encoding='utf-8') as fin:
        rows = list(csv.reader(fin))
    return [r[0] for r in rows], [r[1] for r in rows]


class AnimeFaceLabel(ImageLabel):
    '''Images + illustration2vec tag labels (labels.csv from preprocess/).'''

    def __init__(self, image_size: int, transform: Optional[Callable] = None) -> None:
        if transform is None:
            transform = make_default_transform(image_size)
        super().__init__(transform)

    def _load(self):
        return _read_labels_csv()


class AnimeFaceOneHot(ImageOnehot):
    def __init__(self, image_size: int, transform: Optional[Callable] = None) -> None:
        if transform is None:
            transform = make_default_transform(image_size)
        super().__init__(transform)

    def _load(self):
        return _read_labels_csv()
