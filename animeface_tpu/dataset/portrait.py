'''Danbooru Portrait dataset family (reference `dataset/portrait.py`).'''

from __future__ import annotations

import glob
import random
from collections.abc import Callable
from typing import Optional

from animeface_tpu.dataset._base import (
    Image, ImageImage, ImageXDoG, ImageGray, LRHR, make_default_transform,
    data_path,
)


def _portrait_images() -> list[str]:
    return sorted(glob.glob(data_path('danbooru', 'portraits', 'portraits', '*')))


class DanbooruPortrait(Image):
    def __init__(self, image_size: int, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        if transform is None:
            transform = make_default_transform(image_size, 1.2)
        super().__init__(transform)

    def _load(self) -> list[str]:
        paths = _portrait_images()
        if self.num_images is not None:
            random.shuffle(paths)
            paths = paths[:self.num_images]
        return paths


class DanbooruPortraitCelebA(ImageImage):
    def __init__(self, image_size: int, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        if transform is None:
            transform = make_default_transform(image_size, 1.2)
        super().__init__(transform)

    def _load(self):
        images = _portrait_images()
        celeba = sorted(glob.glob(data_path('celeba', 'img_align_celeba', '*')))
        length = min(len(images), len(celeba))
        images, celeba = images[:length], celeba[:length]
        if self.num_images is not None and self.num_images < length:
            random.shuffle(images)
            random.shuffle(celeba)
            images, celeba = images[:self.num_images], celeba[:self.num_images]
        return images, celeba


class DanbooruPortraitSR(LRHR):
    def __init__(self, image_size: int, scale: float = 2,
                 resize_ratio: float = 1.1, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        super().__init__(image_size, scale, resize_ratio)
        if callable(transform):
            self.transform = transform

    def _load(self) -> list[str]:
        paths = _portrait_images()
        if self.num_images is not None:
            random.shuffle(paths)
            paths = paths[:self.num_images]
        return paths


class DanbooruPortraitGray(ImageGray):
    '''rgb + on-the-fly gray (reference original/EDCNN/dataset.py:47:
    Danbooru resize_ratio=1.125).'''

    def __init__(self, image_size: int, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        if transform is None:
            transform = make_default_transform(image_size, 1.125, hflip=False)
        super().__init__(transform)

    def _load(self):
        paths = _portrait_images()
        if self.num_images is not None:
            random.shuffle(paths)
            paths = paths[:self.num_images]
        return paths


class DanbooruPortraitXDoG(ImageXDoG):
    def __init__(self, image_size: int, num_images: Optional[int] = None,
                 transform: Optional[Callable] = None) -> None:
        self.num_images = num_images
        if transform is None:
            transform = make_default_transform(image_size, 1.2, hflip=False)
        super().__init__(transform)

    def _load(self):
        paths = _portrait_images()
        if self.num_images is not None:
            random.shuffle(paths)
            paths = paths[:self.num_images]
        xdogs = [p.replace('portraits/portraits', 'portraits/xdog') for p in paths]
        return paths, xdogs
